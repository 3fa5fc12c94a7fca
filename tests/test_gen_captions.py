"""Caption-generation factory (L6) with a scripted fake LLM."""

import json

from leclip_tpu.data import gen_captions as G
from leclip_tpu.data.corpora import CHALLENGE_HARD_CLS, load_challenge_corpus
from leclip_tpu.data.vocab import COCO_OBJECT_CATEGORIES


def fake_chat(prompt: str) -> str:
    if "randomly select" in prompt:
        return "dog, cat, person"
    if "MUST contain" in prompt:
        cat = prompt.split("MUST contain a ")[1].split(".")[0]
        return f"1. A {cat} in a field. 2. Someone holding a {cat}. 3. 一个{cat}"
    return "1. A dog chasing a cat while a person watches. 2. Short. 3. A knife and a spoon on a table."


def test_parse_composition():
    names = G.parse_composition_response("dog, cat, not-a-class, person")
    assert names == ["dog", "cat", "person"]


def test_generate_compositions(tmp_path):
    out = G.generate_compositions(fake_chat, 3, out_path=str(tmp_path / "comp.json"))
    assert len(out) == 3
    loaded = json.load(open(tmp_path / "comp.json"))
    assert loaded["0"]["category_name"] == ["dog", "cat", "person"]


def test_split_and_rule_filter():
    sents = G.split_numbered_sentences("1. A dog. 2. 一只狗 3. Fine sentence here.")
    assert len(sents) == 3
    assert G.rule_filter_sentence(sents[2])
    assert not G.rule_filter_sentence("一只狗")
    assert not G.rule_filter_sentence("tiny")


def test_filter_captions_with_judge():
    responses = ["1. A dog chasing a cat. 2. Nothing here matches. 3. A person with a frisbee."]
    judge_calls = []

    def judge(prompt):
        judge_calls.append(prompt)
        return "True" if "dog" in prompt or "person" in prompt else "False"

    kept = G.filter_captions(responses, judge=judge)
    caps = [k["caption"] for k in kept]
    assert any("dog" in c for c in caps)
    assert all(any(k["labels"]) for k in kept)
    assert len(judge_calls) == 3


def test_single_label_corpus_format(tmp_path):
    files = G.generate_single_label_corpus(
        fake_chat, COCO_OBJECT_CATEGORIES[:2], loops=1, out_dir=str(tmp_path)
    )
    corpus = files[0]
    assert set(corpus) == {"0", "1"}
    # numbered, rule-filtered lines (the Chinese one dropped)
    assert all(line[0].isdigit() for line in corpus["0"])
    assert len(corpus["0"]) == 2
    assert (tmp_path / "ChatGLM_single_label_1.json").exists()


def test_challenge_corpus_roundtrip(tmp_path):
    lines = G.generate_challenge_corpus(
        fake_chat,
        [["knife", "spoon", "dog"], ["dog", "cat"]],
        CHALLENGE_HARD_CLS,
        out_path=str(tmp_path / "challenge" / "c.jsonl") if (tmp_path / "challenge").mkdir() or True else None,
    )
    assert len(lines) == 1
    assert lines[0]["labels"] == ["knife", "spoon"]
    # the data layer can consume the emitted file
    out = load_challenge_corpus(str(tmp_path / "challenge"))
    assert len(out) >= 1
    text, labels = out[0]
    assert labels[COCO_OBJECT_CATEGORIES.index("knife")] == 1


def test_hf_causal_chat_drives_real_generation_loop(tmp_path):
    """hf_causal_chat runs a REAL transformers sampling generate() loop end
    to end through the factory (the closest exercisable stand-in for live
    ChatGLM in a zero-egress environment): a tiny locally-instantiated
    causal LM + a programmatically-built WordLevel tokenizer — no hub
    access. Asserts the chat contract (str continuation, prompt stripped)
    and that every factory stage runs on its output and emits
    format-valid artifacts."""
    import torch
    from tokenizers import Tokenizer, models, pre_tokenizers
    from transformers import GPT2Config, GPT2LMHeadModel, PreTrainedTokenizerFast

    words = ["[UNK]", "[PAD]", "[EOS]", "1", "2", ".", ",", "a", "the",
             "dog", "cat", "person", "pizza", "scene", "with", "and"]
    tok = Tokenizer(models.WordLevel(
        vocab={w: i for i, w in enumerate(words)}, unk_token="[UNK]"))
    tok.pre_tokenizer = pre_tokenizers.Whitespace()
    hf_tok = PreTrainedTokenizerFast(
        tokenizer_object=tok, unk_token="[UNK]", pad_token="[PAD]",
        eos_token="[EOS]",
    )
    torch.manual_seed(0)
    model = GPT2LMHeadModel(GPT2Config(
        vocab_size=len(words), n_embd=32, n_layer=2, n_head=2, n_positions=256,
    )).eval()
    chat = G.hf_causal_chat(model, hf_tok, max_new_tokens=24, temperature=0.7)

    resp = chat("a dog and a cat .")
    assert isinstance(resp, str)
    assert not resp.startswith("a dog and a cat .")  # continuation only

    # every factory stage runs on real sampled output; artifacts are
    # format-valid regardless of what the random model says
    comps = G.generate_compositions(
        chat, 3, ["dog", "cat", "person", "pizza"] * 3, seed=0,
        out_path=str(tmp_path / "comps.json"),
    )
    assert json.load(open(tmp_path / "comps.json")) == comps
    files = G.generate_single_label_corpus(
        chat, ["dog", "cat"], loops=1, out_dir=str(tmp_path))
    assert set(files[0]) == {"0", "1"}
    kept = G.filter_captions([chat("describe a scene .") for _ in range(2)],
                             judge=chat, out_path=str(tmp_path / "f.json"))
    assert isinstance(kept, list)
    assert json.load(open(tmp_path / "f.json")) == kept
