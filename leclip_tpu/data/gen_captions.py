"""Caption-generation data factory (the reference's offline L6 stage).

Capability parity with project/gen_cap/ (ref: gen_compositions.py:28-57,
gen_caption.py:30-83, gen_caption_single.py:31-65, gen_caption_challenge.py:
36-93, filter_caption.py:93-200): class-combination sampling, the ChatGLM
prompt protocol, numbered-sentence splitting, rule + LLM-judge filtering, and
label assignment — producing the exact JSON/JSONL artifact formats the data
layer consumes.

The LLM is pluggable: any ``chat(prompt) -> str`` callable. ``chatglm_chat``
wires HuggingFace ChatGLM-6B when transformers + weights are available (they
are not in CI/zero-egress environments — everything else here is pure string
processing and fully tested offline).
"""

from __future__ import annotations

import json
import os
import random
import re
from typing import Callable, Dict, Iterable, List, Optional, Sequence

from .labeling import CaptionLabeler, contains_chinese
from .vocab import COCO_OBJECT_CATEGORIES

ChatFn = Callable[[str], str]

# Prompt protocol (translations of the reference's templates)
COMPOSITION_PROMPT = (
    "Please randomly select 2 to 10 categories from the following list that "
    "may co-occur in a real scene, and output them as a comma-separated "
    "line: {categories}"
)
CAPTION_PROMPT = (
    "Generate 5 simple sentences describing a realistic scene that contains "
    "all of the following objects: {categories}. Number each sentence."
)
SINGLE_LABEL_PROMPT = (
    "Generate 10 simple sentences describing different realistic scenes. "
    "Each sentence MUST contain a {category}. Number each sentence."
)
CHALLENGE_PROMPT = (
    "Generate 4 simple sentences describing a realistic scene that contains "
    "all of the following objects: {categories}. Number each sentence."
)
JUDGE_PROMPT = (
    "Is the following sentence a realistic, plausible scene description? "
    "Answer True or False only.\nSentence: {caption}"
)

_NUMBERED = re.compile(r"\d+\.\s")


def chatglm_chat(model_name: str = "THUDM/chatglm-6b") -> ChatFn:
    """ChatGLM-backed chat function (requires transformers + weights)."""
    from transformers import AutoModel, AutoTokenizer  # noqa: local import

    tokenizer = AutoTokenizer.from_pretrained(model_name, trust_remote_code=True)
    model = AutoModel.from_pretrained(model_name, trust_remote_code=True).half().eval()

    def chat(prompt: str) -> str:
        response, _ = model.chat(
            tokenizer, prompt, history=[], max_length=1200, top_p=0.95
        )
        return response

    return chat


def hf_causal_chat(
    model,
    tokenizer,
    max_new_tokens: int = 256,
    top_p: float = 0.95,
    temperature: Optional[float] = None,
) -> ChatFn:
    """Generic HuggingFace causal-LM chat adapter: any
    ``AutoModelForCausalLM``-style model + tokenizer pair. ChatGLM's
    ``model.chat()`` (ref gen_compositions.py:13-26) is that model's custom
    wrapper around the same sampling ``generate()`` loop with top_p=0.95 and
    optional temperature; this adapter reproduces the contract for standard
    HF checkpoints and returns only the continuation (prompt stripped), like
    ``model.chat``. Exercised in tests with a locally-instantiated tiny
    model — no hub access needed."""
    import torch

    pad_id = tokenizer.pad_token_id
    if pad_id is None:
        pad_id = tokenizer.eos_token_id

    def chat(prompt: str) -> str:
        enc = tokenizer(prompt, return_tensors="pt")
        kwargs = dict(
            max_new_tokens=max_new_tokens, do_sample=True, top_p=top_p,
            pad_token_id=pad_id,
        )
        if temperature is not None:
            kwargs["temperature"] = temperature
        with torch.no_grad():
            out = model.generate(**enc, **kwargs)
        return tokenizer.decode(
            out[0, enc["input_ids"].shape[1]:], skip_special_tokens=True
        )

    return chat


def sample_composition_pool(
    classnames: Sequence[str] = COCO_OBJECT_CATEGORIES,
    pool_size: int = 10,
    rng: Optional[random.Random] = None,
) -> List[str]:
    """The reference samples 10 of the 80 classes per composition query."""
    rng = rng or random.Random()
    return rng.sample(list(classnames), pool_size)


def parse_composition_response(
    response: str, classnames: Sequence[str] = COCO_OBJECT_CATEGORIES
) -> List[str]:
    """Extract valid class names from a composition response."""
    valid = set(classnames)
    found: List[str] = []
    for line in response.replace(",", "\n").splitlines():
        name = line.strip().strip(".").lower()
        if name in valid and name not in found:
            found.append(name)
    return found


def generate_compositions(
    chat: ChatFn,
    n: int,
    classnames: Sequence[str] = COCO_OBJECT_CATEGORIES,
    seed: int = 0,
    out_path: Optional[str] = None,
) -> Dict[str, Dict[str, List[str]]]:
    """compositions_of_image.json: {id: {category_name: [...]}}."""
    rng = random.Random(seed)
    out: Dict[str, Dict[str, List[str]]] = {}
    for i in range(n):
        pool = sample_composition_pool(classnames, rng=rng)
        response = chat(COMPOSITION_PROMPT.format(categories=", ".join(pool)))
        names = parse_composition_response(response, classnames)
        if names:
            out[str(i)] = {"category_name": names}
    if out_path:
        with open(out_path, "w") as f:
            json.dump(out, f)
    return out


def split_numbered_sentences(text: str) -> List[str]:
    """Split a numbered ChatGLM response into sentences (regex `\\d+\\.\\s`,
    ref filter_caption.py:93-163). Returns cleaned sentences."""
    parts = _NUMBERED.split(text)
    return [p.strip() for p in parts if p.strip()]


def rule_filter_sentence(sent: str, min_len: int = 5, max_len: int = 150) -> bool:
    return (
        not contains_chinese(sent)
        and min_len < len(sent) < max_len
    )


def filter_captions(
    raw_responses: Iterable[str],
    labeler: Optional[CaptionLabeler] = None,
    judge: Optional[ChatFn] = None,
    out_path: Optional[str] = None,
) -> List[dict]:
    """Stage-1 rule filtering + optional stage-2 LLM realism judge + labeling
    → the ChatGLM_multi_labels_filtered.json format [{id, caption, labels}]."""
    labeler = labeler or CaptionLabeler()
    kept: List[dict] = []
    idx = 0
    for response in raw_responses:
        for sent in split_numbered_sentences(response):
            if not rule_filter_sentence(sent):
                continue
            if judge is not None:
                verdict = judge(JUDGE_PROMPT.format(caption=sent)).strip().lower()
                if not verdict.startswith("true"):
                    continue
            labels = labeler(sent)
            if not any(labels):
                continue
            kept.append({"id": idx, "caption": sent, "labels": labels})
            idx += 1
    if out_path:
        with open(out_path, "w") as f:
            json.dump(kept, f)
    return kept


def generate_single_label_corpus(
    chat: ChatFn,
    classnames: Sequence[str] = COCO_OBJECT_CATEGORIES,
    loops: int = 1,
    out_dir: Optional[str] = None,
    start_index: int = 1,
) -> List[Dict[str, List[str]]]:
    """ChatGLM_single_label_{t}.json files: {class_idx: [numbered lines]}."""
    files = []
    for t in range(loops):
        corpus: Dict[str, List[str]] = {}
        for idx, cname in enumerate(classnames):
            response = chat(SINGLE_LABEL_PROMPT.format(category=cname))
            lines = [
                f"{i + 1}. {s}" for i, s in enumerate(split_numbered_sentences(response))
                if rule_filter_sentence(s)
            ]
            corpus[str(idx)] = lines
        files.append(corpus)
        if out_dir:
            path = os.path.join(out_dir, f"ChatGLM_single_label_{start_index + t}.json")
            with open(path, "w") as f:
                json.dump(corpus, f)
    return files


def generate_challenge_corpus(
    chat: ChatFn,
    compositions: Iterable[Sequence[str]],
    challenge_classes: Sequence[str],
    out_path: Optional[str] = None,
) -> List[dict]:
    """captions_score_challenge.jsonl lines {labels, captions}: each combo is
    intersected with the challenge-class list (ref gen_caption_challenge.py)."""
    challenge = set(challenge_classes)
    lines: List[dict] = []
    for combo in compositions:
        subset = sorted(set(combo) & challenge)
        if not subset:
            continue
        response = chat(CHALLENGE_PROMPT.format(categories=", ".join(subset)))
        captions = [
            f"{i + 1}. {s}" for i, s in enumerate(split_numbered_sentences(response))
            if rule_filter_sentence(s)
        ]
        if captions:
            lines.append({"labels": subset, "captions": captions})
    if out_path:
        with open(out_path, "w") as f:
            for line in lines:
                f.write(json.dumps(line) + "\n")
    return lines
