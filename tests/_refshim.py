"""Shims that make the reference's ACTUAL torch modules importable in this
environment, so golden tests can compare against the reference code itself
rather than against hand transcriptions of it.

The reference (`/root/reference/project/my_code/`) imports a handful of
packages this image lacks (ftfy, mmcv, pickle5, torchvision, yacs, dassl) and
calls `.cuda()` at module import time. Every shim below is a *dependency
stand-in only* — no reference logic is re-implemented here beyond
`IntermediateLayerGetter` (a ~15-line torchvision utility) and pure file/PIL
conversions; the model/loss math under test runs from the reference's own
source files.
"""

from __future__ import annotations

import ast
import importlib
import importlib.machinery
import os
import pickle
import sys
import types
from collections import OrderedDict


def _stub_module(name: str) -> types.ModuleType:
    """A stub module WITH a ModuleSpec — later `importlib.util.find_spec`
    probes (e.g. transformers checking ftfy availability) raise ValueError on
    spec-less modules."""
    mod = types.ModuleType(name)
    mod.__spec__ = importlib.machinery.ModuleSpec(name, loader=None)
    return mod

from tests.conftest import REFERENCE_ROOT

MY_CODE = os.path.join(REFERENCE_ROOT, "project", "my_code")

_installed = False


def install_shims() -> None:
    """Idempotently install import shims for the reference's dependencies."""
    global _installed
    if _installed:
        return
    import numpy as np
    import torch
    import torch.nn as nn

    # numpy 2.x removed `deprecate` (trainers/utils.py:1 uses it as decorator)
    if not hasattr(np, "deprecate"):
        def _deprecate(func=None, **_kw):
            if func is None:
                return lambda f: f
            return func
        np.deprecate = _deprecate

    # ftfy.fix_text — identity is exact for the ASCII prompts under test
    if "ftfy" not in sys.modules:
        ftfy = _stub_module("ftfy")
        ftfy.fix_text = lambda s: s
        sys.modules["ftfy"] = ftfy

    # pickle5 → stdlib pickle (same protocol support on py3.12)
    sys.modules.setdefault("pickle5", pickle)

    # mmcv.load — only used to read pickle artifacts
    if "mmcv" not in sys.modules:
        mmcv = _stub_module("mmcv")
        def _load(path):
            with open(path, "rb") as f:
                return pickle.load(f)
        mmcv.load = _load
        sys.modules["mmcv"] = mmcv

    # torchvision: the reference uses transforms (names only at import time)
    # and models._utils.IntermediateLayerGetter (re-implemented faithfully —
    # a ModuleDict of children up to the last requested layer).
    if "torchvision" not in sys.modules:
        tv = _stub_module("torchvision")
        transforms = _stub_module("torchvision.transforms")
        functional = _stub_module("torchvision.transforms.functional")

        class _Unavailable:
            def __init__(self, *a, **k):
                raise RuntimeError("torchvision transform shim: not callable")

        for name in ("Compose", "Resize", "CenterCrop", "ToTensor", "Normalize"):
            setattr(transforms, name, type(name, (_Unavailable,), {}))

        class InterpolationMode:
            BICUBIC = "bicubic"
            BILINEAR = "bilinear"
            NEAREST = "nearest"

        transforms.InterpolationMode = InterpolationMode

        def to_tensor(pil):
            arr = np.asarray(pil, dtype=np.uint8)
            if arr.ndim == 2:
                arr = arr[:, :, None]
            t = torch.from_numpy(arr.copy()).permute(2, 0, 1).float() / 255.0
            return t

        def to_pil_image(tensor):
            from PIL import Image
            arr = (tensor.clamp(0, 1) * 255.0).round().byte()
            arr = arr.permute(1, 2, 0).numpy()
            if arr.shape[2] == 1:
                arr = arr[:, :, 0]
            return Image.fromarray(arr)

        def pad(tensor, padding, padding_mode="constant", fill=0):
            # torchvision F.pad on a CHW tensor, (left, right, top, bottom).
            # Negative padding crops (torch semantics) — the reference's
            # padding formula (data_manager.py:388) can go negative for some
            # image sizes; apply crops first, then the reflect pad.
            left, right, top, bottom = (int(p) for p in padding)
            x = tensor
            if left < 0:
                x = x[:, :, -left:]
                left = 0
            if right < 0:
                x = x[:, :, :right]
                right = 0
            if top < 0:
                x = x[:, -top:, :]
                top = 0
            if bottom < 0:
                x = x[:, :bottom, :]
                bottom = 0
            if left or right or top or bottom:
                mode = {"reflect": "reflect", "edge": "replicate"}.get(
                    padding_mode, "constant"
                )
                x = torch.nn.functional.pad(
                    x.unsqueeze(0), [left, right, top, bottom], mode=mode
                ).squeeze(0)
            return x

        functional.to_tensor = to_tensor
        functional.to_pil_image = to_pil_image
        functional.pad = pad
        transforms.functional = functional

        models = _stub_module("torchvision.models")
        _utils = _stub_module("torchvision.models._utils")

        class IntermediateLayerGetter(nn.ModuleDict):
            """Faithful re-implementation of torchvision's utility: keeps the
            model's children in order up to the last requested layer; used by
            the reference only as an attribute container (DenseCLIP calls
            conv1/bn1/.../layer4 directly, Caption_distill_double.py:385-399).
            """

            def __init__(self, model, return_layers):
                if not set(return_layers).issubset(
                    name for name, _ in model.named_children()
                ):
                    raise ValueError("return_layers are not present in model")
                orig_return_layers = dict(return_layers)
                remaining = dict(return_layers)
                layers = OrderedDict()
                for name, module in model.named_children():
                    layers[name] = module
                    if name in remaining:
                        del remaining[name]
                    if not remaining:
                        break
                super().__init__(layers)
                self.return_layers = orig_return_layers

            def forward(self, x):
                out = OrderedDict()
                for name, module in self.items():
                    x = module(x)
                    if name in self.return_layers:
                        out[self.return_layers[name]] = x
                return out

        _utils.IntermediateLayerGetter = IntermediateLayerGetter
        models._utils = _utils
        tv.transforms = transforms
        tv.models = models
        sys.modules["torchvision"] = tv
        sys.modules["torchvision.transforms"] = transforms
        sys.modules["torchvision.transforms.functional"] = functional
        sys.modules["torchvision.models"] = models
        sys.modules["torchvision.models._utils"] = _utils

    # dassl: registry decorator + names the trainer module imports but the
    # golden tests never call (we instantiate DenseCLIP/PromptLearner, not
    # the Trainer).
    if "dassl" not in sys.modules:
        dassl = _stub_module("dassl")

        class _Registry:
            def register(self, *_a, **_k):
                return lambda cls: cls

        engine = _stub_module("dassl.engine")
        engine.TRAINER_REGISTRY = _Registry()
        engine.TrainerX = type("TrainerX", (), {})
        metrics = _stub_module("dassl.metrics")
        metrics.compute_accuracy = lambda *a, **k: None
        utils = _stub_module("dassl.utils")
        utils.load_pretrained_weights = lambda *a, **k: None
        utils.load_checkpoint = lambda *a, **k: None
        optim = _stub_module("dassl.optim")
        optim.build_optimizer = lambda *a, **k: None
        optim.build_lr_scheduler = lambda *a, **k: None
        dassl.engine = engine
        dassl.metrics = metrics
        dassl.utils = utils
        dassl.optim = optim
        sys.modules["dassl"] = dassl
        sys.modules["dassl.engine"] = engine
        sys.modules["dassl.metrics"] = metrics
        sys.modules["dassl.utils"] = utils
        sys.modules["dassl.optim"] = optim

    # .cuda() no-ops (cpu-only torch; the reference calls it at import time)
    torch.Tensor.cuda = lambda self, *a, **k: self
    nn.Module.cuda = lambda self, *a, **k: self

    if MY_CODE not in sys.path:
        sys.path.insert(0, MY_CODE)
    _installed = True


def install_data_shims() -> None:
    """Shims for importing the reference's dataset builders
    (datasets/pazhou_distill_chatglm*.py) so they can be EXECUTED directly:

    * ``nltk`` — this image has no nltk corpora (zero egress), so the
      linguistic layer (word_tokenize / pos_tag / WordNetLemmatizer) is
      replaced by the SAME deterministic rule lemmatizer our
      ``leclip_tpu.data.labeling`` uses. Both sides therefore lemmatize
      identically BY CONSTRUCTION; what the golden tests actually compare is
      everything around it — the synonym matching loops, filters, caching
      contract, template/category synthesis, item order, and label algebra —
      running from the reference's own source.
    * ``jsonlines`` / ``pycocotools`` / ``mmcv.dump`` / ``dassl.data.datasets``
      — plain dependency stand-ins (a line reader, an unused import, pickle,
      and a Datum/DatasetBase record holder).
    """
    install_shims()
    import numpy as np  # noqa: F401  (kept for parity with install_shims)

    from leclip_tpu.data.labeling import _WORD_RE, CaptionLabeler

    _labeler = CaptionLabeler()

    if not isinstance(sys.modules.get("nltk"), types.ModuleType) or not getattr(
        sys.modules.get("nltk"), "_leclip_shim", False
    ):
        nltk = _stub_module("nltk")
        nltk._leclip_shim = True
        nltk.word_tokenize = lambda s: _WORD_RE.findall(s)
        nltk.pos_tag = lambda toks: [(t, "NN") for t in toks]

        corpus = _stub_module("nltk.corpus")

        class _WordNet:
            ADJ, VERB, NOUN, ADV = "a", "v", "n", "r"

        corpus.wordnet = _WordNet()

        stem = _stub_module("nltk.stem")

        class WordNetLemmatizer:
            def lemmatize(self, tok, pos="n"):
                return _labeler._lemma(tok)

        stem.WordNetLemmatizer = WordNetLemmatizer
        nltk.corpus = corpus
        nltk.stem = stem
        sys.modules["nltk"] = nltk
        sys.modules["nltk.corpus"] = corpus
        sys.modules["nltk.stem"] = stem

    if "jsonlines" not in sys.modules:
        import json as _json

        jsonlines = _stub_module("jsonlines")

        class Reader:
            def __init__(self, fp):
                self._fp = fp

            def __iter__(self):
                for line in self._fp:
                    line = line.strip()
                    if line:
                        yield _json.loads(line)

        jsonlines.Reader = Reader
        sys.modules["jsonlines"] = jsonlines

    if "pycocotools" not in sys.modules:
        pycocotools = _stub_module("pycocotools")
        coco = _stub_module("pycocotools.coco")
        coco.COCO = type("COCO", (), {})
        pycocotools.coco = coco
        sys.modules["pycocotools"] = pycocotools
        sys.modules["pycocotools.coco"] = coco

    mmcv = sys.modules["mmcv"]
    if not hasattr(mmcv, "dump"):
        def _dump(obj, path):
            with open(path, "wb") as f:
                pickle.dump(obj, f)
        mmcv.dump = _dump

    dassl = sys.modules["dassl"]
    if "dassl.data.datasets" not in sys.modules:
        data = _stub_module("dassl.data")
        datasets = _stub_module("dassl.data.datasets")

        class _Registry:
            def register(self, *_a, **_k):
                return lambda cls: cls

        class Datum:
            def __init__(self, impath="", label=None, domain=0, classname=""):
                self.impath = impath
                self.label = label
                self.domain = domain
                self.classname = classname

        class DatasetBase:
            def __init__(self, train_x=None, train_u=None, val=None, test=None,
                         num_classes=None, classnames=None, lab2cname=None):
                self.train_x = train_x
                self.train_u = train_u
                self.val = val
                self.test = test
                self.num_classes = num_classes
                self.classnames = classnames
                self.lab2cname = lab2cname

        datasets.DATASET_REGISTRY = _Registry()
        datasets.Datum = Datum
        datasets.DatasetBase = DatasetBase
        data.datasets = datasets
        dassl.data = data
        sys.modules["dassl.data"] = data
        sys.modules["dassl.data.datasets"] = datasets

    utils = sys.modules["dassl.utils"]
    if not hasattr(utils, "read_json"):
        import json as _json

        def read_json(path):
            with open(path) as f:
                return _json.load(f)

        utils.read_json = read_json
        utils.mkdir_if_missing = lambda p: os.makedirs(p, exist_ok=True)


def import_ref_dataset(variant: str):
    """Import a reference dataset module (e.g.
    'pazhou_distill_chatglm_multi_label_mix') for direct execution.

    The installed HuggingFace `datasets` package shadows the reference's
    namespace `datasets/` directory, so the modules are loaded under a
    synthetic `refdatasets` package whose __path__ points at the reference."""
    install_data_shims()
    if "refdatasets" not in sys.modules:
        pkg = _stub_module("refdatasets")
        pkg.__path__ = [os.path.join(MY_CODE, "datasets")]
        pkg.__package__ = "refdatasets"
        sys.modules["refdatasets"] = pkg
    return importlib.import_module(f"refdatasets.{variant}")


def import_ref_module(name: str):
    """Import a module from the reference's my_code tree (e.g.
    'trainers.utils', 'clip.model') with the shims installed."""
    install_shims()
    return importlib.import_module(name)


def import_caption_distill(workdir: str):
    """Import the reference's trainers/Caption_distill_double.py.

    The module loads `./ChatGLM_..._caption_text_feats.pkl` at import time
    (Caption_distill_double.py:35-36); `workdir` must contain that file
    (see `plant_caption_bank`)."""
    install_shims()
    cwd = os.getcwd()
    os.chdir(workdir)
    try:
        return importlib.import_module("trainers.Caption_distill_double")
    finally:
        os.chdir(cwd)


BANK_PKL = "ChatGLM_multi_labels_filtered_22w_all_caption_text_feats.pkl"


def plant_caption_bank(workdir: str, bank) -> None:
    """Write the module-level caption-bank pickle the reference loads at
    import (a torch tensor; shape [N, 1024] — 1024 is hardcoded in the
    reference's retrieval view, Caption_distill_double.py:447)."""
    import torch

    with open(os.path.join(workdir, BANK_PKL), "wb") as f:
        pickle.dump(torch.as_tensor(bank).float(), f)


def load_ref_lr_scheduler():
    """Load dassl/optim/lr_scheduler.py standalone (torch-only module).

    The reference targets torch 1.11, whose ``_LRScheduler.__init__`` took a
    positional ``verbose``; bridge the arity for modern torch — behaviour is
    unchanged, only the removed argument is dropped."""
    import importlib.util

    import torch.optim.lr_scheduler as tls

    orig = tls._LRScheduler

    class _CompatLRScheduler(orig):
        def __init__(self, optimizer, last_epoch=-1, verbose=False):
            super().__init__(optimizer, last_epoch)

    tls._LRScheduler = _CompatLRScheduler
    try:
        spec = importlib.util.spec_from_file_location(
            "ref_lr_scheduler",
            os.path.join(
                MY_CODE, "Dassl.pytorch-master", "dassl", "optim",
                "lr_scheduler.py",
            ),
        )
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
    finally:
        tls._LRScheduler = orig
    return mod


def install_yacs_shim() -> None:
    """A faithful mini-yacs CfgNode so the reference's config stack
    (dassl/config/defaults.py + train_caption.py setup_cfg) can be EXECUTED
    directly (yacs is not installed in this image).

    Replicates the yacs 0.1.8 behaviours that stack exercises:
    attribute-dict with nested-CfgNode conversion; clone() = deepcopy;
    freeze()/defrost(); merge_from_file / merge_from_list with
    ``_decode_cfg_value`` (literal_eval on YAML strings — how ``LR: 1e-5``
    and ``SIZE: (224, 224)`` become float/tuple, since PyYAML leaves both as
    str) and ``_check_and_coerce_cfg_value`` (same-type replace, list<->tuple
    casts, TypeError otherwise); KeyError on non-existent merge keys; and
    new-key creation via plain attribute assignment (how extend_cfg /
    reset_cfg add ``cfg.TRAINER.Caption`` / ``cfg.eval_only``).
    """
    if "yacs.config" in sys.modules:
        return
    import copy as _copy

    class CfgNode(dict):
        def __init__(self, init_dict=None):
            init_dict = {} if init_dict is None else dict(init_dict)
            for k, v in init_dict.items():
                if type(v) is dict:
                    init_dict[k] = CfgNode(v)
            super().__init__(init_dict)
            self.__dict__["__immutable__"] = False

        def __getattr__(self, name):
            try:
                return self[name]
            except KeyError:
                raise AttributeError(name)

        def __setattr__(self, name, value):
            if self.__dict__.get("__immutable__", False):
                raise AttributeError(
                    f"Attempted to set {name} to {value}, but CfgNode is immutable"
                )
            self[name] = value

        def _immutable(self, flag):
            self.__dict__["__immutable__"] = flag
            for v in self.values():
                if isinstance(v, CfgNode):
                    v._immutable(flag)

        def freeze(self):
            self._immutable(True)

        def defrost(self):
            self._immutable(False)

        def clone(self):
            return _copy.deepcopy(self)

        def is_frozen(self):
            return self.__dict__.get("__immutable__", False)

        @classmethod
        def _decode_cfg_value(cls, v):
            if isinstance(v, dict):
                return cls(v)
            if not isinstance(v, str):
                return v
            try:
                return ast.literal_eval(v)
            except (ValueError, SyntaxError):
                return v

        def merge_from_file(self, cfg_filename):
            import yaml

            with open(cfg_filename) as f:
                loaded = CfgNode(yaml.safe_load(f) or {})
            _merge_a_into_b(loaded, self, self, [])

        def merge_from_other_cfg(self, cfg_other):
            _merge_a_into_b(cfg_other, self, self, [])

        def merge_from_list(self, cfg_list):
            assert len(cfg_list) % 2 == 0, (
                f"Override list has odd length: {cfg_list}"
            )
            for full_key, v in zip(cfg_list[0::2], cfg_list[1::2]):
                key_list = full_key.split(".")
                d = self
                for subkey in key_list[:-1]:
                    assert subkey in d, f"Non-existent key: {full_key}"
                    d = d[subkey]
                subkey = key_list[-1]
                assert subkey in d, f"Non-existent key: {full_key}"
                value = self._decode_cfg_value(v)
                value = _check_and_coerce_cfg_value(value, d[subkey], full_key)
                d[subkey] = value

    def _check_and_coerce_cfg_value(replacement, original, full_key):
        original_type = type(original)
        replacement_type = type(replacement)
        if replacement_type == original_type:
            return replacement
        # yacs casts: list <-> tuple only
        if isinstance(replacement, list) and isinstance(original, tuple):
            return tuple(replacement)
        if isinstance(replacement, tuple) and isinstance(original, list):
            return list(replacement)
        raise ValueError(
            f"Type mismatch ({original_type} vs. {replacement_type}) with "
            f"values ({original} vs. {replacement}) for config key: {full_key}"
        )

    def _merge_a_into_b(a, b, root, key_list):
        for k in a:
            full_key = ".".join(key_list + [k])
            v = _copy.deepcopy(a[k])
            v = b._decode_cfg_value(v)
            if k in b:
                v = _check_and_coerce_cfg_value(v, b[k], full_key)
                if isinstance(v, CfgNode):
                    _merge_a_into_b(v, b[k], root, key_list + [k])
                else:
                    b[k] = v
            else:
                raise KeyError(f"Non-existent config key: {full_key}")

    yacs = _stub_module("yacs")
    config = _stub_module("yacs.config")
    config.CfgNode = CfgNode
    yacs.config = config
    sys.modules["yacs"] = yacs
    sys.modules["yacs.config"] = config


def load_ref_config_stack():
    """Execute the reference's config stack directly: dassl/config/defaults.py
    (builds the yacs default tree, ref dassl/config/defaults.py:1-277) plus
    train_caption.py's extend_cfg / reset_cfg / setup_cfg (ref
    train_caption.py:37-166), extracted without importing the module's heavy
    trainer/dataset imports. Returns the namespace with ``setup_cfg`` and
    ``get_cfg_default``."""
    install_yacs_shim()
    import importlib.util

    defaults_path = os.path.join(
        MY_CODE, "Dassl.pytorch-master", "dassl", "config", "defaults.py"
    )
    spec = importlib.util.spec_from_file_location("ref_dassl_defaults", defaults_path)
    dmod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(dmod)

    def get_cfg_default():
        return dmod._C.clone()

    ns = extract_functions(
        os.path.join(MY_CODE, "train_caption.py"),
        ["reset_cfg", "extend_cfg", "setup_cfg"],
        extra_globals={"get_cfg_default": get_cfg_default},
    )
    ns["get_cfg_default"] = get_cfg_default
    return ns


def extract_functions(path: str, names, extra_globals=None):
    """Exec only the named top-level def/class statements from a reference
    source file (for files whose module level also runs scripts/IO)."""
    with open(path) as f:
        tree = ast.parse(f.read(), filename=path)
    wanted = [
        node for node in tree.body
        if isinstance(node, (ast.FunctionDef, ast.ClassDef)) and node.name in names
    ]
    missing = set(names) - {n.name for n in wanted}
    if missing:
        raise KeyError(f"{path} lacks {sorted(missing)}")
    module = ast.Module(body=wanted, type_ignores=[])
    import numpy as np
    import torch

    ns = {"np": np, "numpy": np, "torch": torch, "math": __import__("math")}
    if extra_globals:
        ns.update(extra_globals)
    exec(compile(module, path, "exec"), ns)
    return ns
