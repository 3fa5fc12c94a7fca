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
