"""Class vocabularies, synonym tables, and prompt templates.

The 80-class COCO synonym table and the 80 ImageNet prompt templates are the
public data tables the reference uses for caption→label extraction and
template-based caption synthesis (ref: project/my_code/datasets/
data_helpers.py:13-96,169-252). Synonyms are matched both as written and —
for compound names — with spaces collapsed (e.g. "hot dog" and "hotdog").
"""

from __future__ import annotations

from typing import Dict, List, Set, Tuple

PROMPT_TEMPLATE = "a photo of a {}."

IMAGENET_TEMPLATES: List[str] = [
    "a bad photo of a {}.",
    "a photo of many {}.",
    "a sculpture of a {}.",
    "a photo of the hard to see {}.",
    "a low resolution photo of the {}.",
    "a rendering of a {}.",
    "graffiti of a {}.",
    "a bad photo of the {}.",
    "a cropped photo of the {}.",
    "a tattoo of a {}.",
    "the embroidered {}.",
    "a photo of a hard to see {}.",
    "a bright photo of a {}.",
    "a photo of a clean {}.",
    "a photo of a dirty {}.",
    "a dark photo of the {}.",
    "a drawing of a {}.",
    "a photo of my {}.",
    "the plastic {}.",
    "a photo of the cool {}.",
    "a close-up photo of a {}.",
    "a black and white photo of the {}.",
    "a painting of the {}.",
    "a painting of a {}.",
    "a pixelated photo of the {}.",
    "a sculpture of the {}.",
    "a bright photo of the {}.",
    "a cropped photo of a {}.",
    "a plastic {}.",
    "a photo of the dirty {}.",
    "a jpeg corrupted photo of a {}.",
    "a blurry photo of the {}.",
    "a photo of the {}.",
    "a good photo of the {}.",
    "a rendering of the {}.",
    "a {} in a video game.",
    "a photo of one {}.",
    "a doodle of a {}.",
    "a close-up photo of the {}.",
    "a photo of a {}.",
    "the origami {}.",
    "the {} in a video game.",
    "a sketch of a {}.",
    "a doodle of the {}.",
    "a origami {}.",
    "a low resolution photo of a {}.",
    "the toy {}.",
    "a rendition of the {}.",
    "a photo of the clean {}.",
    "a photo of a large {}.",
    "a rendition of a {}.",
    "a photo of a nice {}.",
    "a photo of a weird {}.",
    "a blurry photo of a {}.",
    "a cartoon {}.",
    "art of a {}.",
    "a sketch of the {}.",
    "a embroidered {}.",
    "a pixelated photo of a {}.",
    "itap of the {}.",
    "a jpeg corrupted photo of the {}.",
    "a good photo of a {}.",
    "a plushie {}.",
    "a photo of the nice {}.",
    "a photo of the small {}.",
    "a photo of the weird {}.",
    "the cartoon {}.",
    "art of the {}.",
    "a drawing of the {}.",
    "a photo of the large {}.",
    "a black and white photo of a {}.",
    "the plushie {}.",
    "a dark photo of a {}.",
    "itap of a {}.",
    "graffiti of the {}.",
    "a toy {}.",
    "itap of my {}.",
    "a photo of a cool {}.",
    "a photo of a small {}.",
    "a tattoo of the {}.",
]

# index i of the outer list = class id i; first synonym = canonical class name.
COCO_CLASSNAME_SYNONYMS: List[List[str]] = [
    ["person", "human", "people", "man", "woman", "passenger"],
    ["bicycle", "bike", "cycle"],
    ["car", "taxi", "auto", "automobile", "motor car"],
    ["motor bike", "motor cycle"],
    ["aeroplane", "air craft", "jet", "plane", "air plane"],
    ["bus", "autobus", "coach", "charabanc", "double decker", "jitney",
     "motor bus", "motor coach", "omnibus"],
    ["train", "rail way", "railroad"],
    ["truck"],
    ["boat", "raft", "dinghy"],
    ["traffic light"],
    ["fire hydrant", "fire tap", "hydrant"],
    ["stop sign", "halt sign"],
    ["parking meter"],
    ["bench"],
    ["bird"],
    ["cat", "kitty"],
    ["dog", "pup", "puppy", "doggy"],
    ["horse", "colt", "equus"],
    ["sheep"],
    ["cow"],
    ["elephant"],
    ["bear"],
    ["zebra"],
    ["giraffe", "camelopard"],
    ["backpack", "back pack", "knapsack", "packsack", "rucksack", "haversack"],
    ["umbrella"],
    ["handbag", "hand bag", "pocketbook", "purse"],
    ["tie", "necktie"],
    ["suitcase"],
    ["frisbee"],
    ["skis", "ski"],
    ["snowboard"],
    ["sports ball", "sport ball", "ball", "football", "soccer", "tennis",
     "basketball", "baseball"],
    ["kite"],
    ["baseball bat", "baseball game bat"],
    ["baseball glove", "baseball mitt", "baseball game glove"],
    ["skateboard"],
    ["surfboard"],
    ["tennis racket"],
    ["bottle"],
    ["wine glass", "vino glass"],
    ["cup"],
    ["fork"],
    ["knife"],
    ["spoon"],
    ["bowl"],
    ["banana"],
    ["apple"],
    ["sandwich"],
    ["orange"],
    ["broccoli"],
    ["carrot"],
    ["hot dog"],
    ["pizza"],
    ["donut", "doughnut"],
    ["cake"],
    ["chair", "arm chair"],
    ["couch", "sofa"],
    ["potted plant", "house plant", "bonsai", "pot plant"],
    ["bed"],
    ["dining table", "dinner table", "table", "din table"],
    ["toilet", "commode"],
    ["tv", "tvmonitor", "monitor", "television", "telly"],
    ["laptop"],
    ["mouse"],
    ["remote"],
    ["keyboard"],
    ["cell phone", "phone", "mobile phone"],
    ["microwave"],
    ["oven", "roaster"],
    ["toaster"],
    ["sink"],
    ["refrigerator", "icebox"],
    ["book"],
    ["clock"],
    ["vase"],
    ["scissors"],
    ["teddy bear", "teddy"],
    ["hair drier", "blowing machine", "hair dryer", "dryer", "blow dryer",
     "blown dry", "blow dry"],
    ["toothbrush"],
]

COCO_OBJECT_CATEGORIES: List[str] = [s[0] for s in COCO_CLASSNAME_SYNONYMS]


def build_synonym_index(
    synonyms: List[List[str]] = COCO_CLASSNAME_SYNONYMS,
) -> Tuple[Dict[str, int], Set[str], Set[str]]:
    """Build name→class-id map plus the compound/simple name sets used for
    longest-first matching. Compound names also register space-collapsed."""
    name2idx: Dict[str, int] = {}
    compound: Set[str] = set()
    simple: Set[str] = set()
    for idx, synset in enumerate(synonyms):
        for name in synset:
            name2idx[name] = idx
            if " " in name:
                compound.add(name)
                collapsed = name.replace(" ", "")
                name2idx[collapsed] = idx
                simple.add(collapsed)
            else:
                simple.add(name)
    return name2idx, compound, simple
