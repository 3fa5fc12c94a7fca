"""Golden tests against the reference's OWN code, executed directly.

Everything here imports (or extracts and executes) the reference's actual
torch sources from /root/reference — `trainers/Caption_distill_double.py`,
`trainers/utils.py`, `trainers/csel.py`, `trainers/dbl.py`,
`gen_final_ans.py`, the Dassl evaluator mAP and the Dassl crop factory — and
compares our JAX implementations against what that code computes on the same
tiny random weights/inputs. This upgrades the transcription-based golden
tests (tests/test_dense_clip_golden.py, tests/test_losses.py, ...): the
source of truth is the reference program itself, not our reading of it.

Dependency shims (ftfy/mmcv/torchvision/dassl/... stand-ins) live in
tests/_refshim.py; no reference math is re-implemented there.
"""

import json
import os
import runpy
from types import SimpleNamespace as NS

import numpy as np
import pytest
import torch

import jax.numpy as jnp

from tests.conftest import REFERENCE_ROOT, has_reference

pytestmark = pytest.mark.skipif(
    not has_reference(), reason="reference repo not mounted"
)

EMBED_DIM = 1024  # the reference hardcodes 1024 in its retrieval reshape
                  # (Caption_distill_double.py:447) — the tiny model must match
CLASSNAMES = ["dog", "traffic light", "baseball bat", "person", "pizza"]
N_CTX = 4
N_CLS = len(CLASSNAMES)

TRAINABLE_FIELDS = (
    "ctx", "ctx_double", "ctx_evidence", "temperature", "spatial_T",
    "ranking_scale",
)


def _make_cfg(use_evidence=True, ema=False):
    """The attribute tree the reference model classes read (yacs stand-in)."""
    return NS(
        TRAINER=NS(Caption=NS(
            N_CTX=N_CTX, CTX_INIT="", CSC=False,
            CLASS_TOKEN_POSITION="end", use_evidence=use_evidence,
        )),
        INPUT=NS(SIZE=(64, 64)),
        TRAIN=NS(
            IF_LEARN_SCALE=False, IF_LEARN_spatial_SCALE=False,
            spatial_SCALE_text=50, spatial_SCALE_image=50,
            ema=ema, momentum=0.995,
        ),
    )


def _copy_trainable(ref_prompt_learner):
    """Lift the reference PromptLearner's parameters into our trainable
    pytree (same field names by design)."""
    return {
        f: jnp.asarray(getattr(ref_prompt_learner, f).detach().numpy())
        for f in TRAINABLE_FIELDS
    }


@pytest.fixture(scope="module")
def ref_env(tmp_path_factory):
    """Import the reference trainer module (with its module-level caption
    bank planted) + build one tiny CLIP shared by every test here."""
    from tests import _refshim

    workdir = tmp_path_factory.mktemp("refcd")
    rng = np.random.default_rng(7)
    bank = rng.normal(size=(64, EMBED_DIM)).astype(np.float32)
    bank /= np.linalg.norm(bank, axis=-1, keepdims=True)
    _refshim.plant_caption_bank(str(workdir), bank)
    refcd = _refshim.import_caption_distill(str(workdir))

    rm = _refshim.import_ref_module("clip.model")
    torch.manual_seed(0)
    clip_model = rm.CLIP(
        embed_dim=EMBED_DIM, image_resolution=64, vision_layers=(1, 1, 1, 1),
        vision_width=8, vision_patch_size=None, context_length=77,
        vocab_size=49408, transformer_width=128, transformer_heads=2,
        transformer_layers=2,
    ).float().eval()

    from leclip_tpu.models.convert import convert_state_dict

    ccfg, params = convert_state_dict(
        {k: v.numpy() for k, v in clip_model.state_dict().items()}
    )
    return NS(refcd=refcd, clip=clip_model, bank=bank, ccfg=ccfg,
              params=params, workdir=str(workdir))


def _tokens(texts):
    from leclip_tpu.data.tokenizer import tokenize

    toks = tokenize(texts, truncate=True)
    return jnp.asarray(toks, jnp.int32), torch.as_tensor(
        np.asarray(toks), dtype=torch.long
    )


CAPTIONS = [
    "a photo of a dog.",
    "a traffic light next to a baseball bat on the street.",
    "a person eating a pizza while their dog watches.",
]


# ------------------------- PromptLearner / DenseCLIP -------------------------


def test_prompt_learner_buffers_match_reference(ref_env):
    """Our prompt scaffolding (tokenized prompts, prefix/suffix embeddings,
    name_lens) equals the reference PromptLearner's buffers bit-for-bit
    (ref Caption_distill_double.py:104-197)."""
    from leclip_tpu.models.prompt import build_prompt_learner
    import jax

    ref_dc = ref_env.refcd.DenseCLIP(_make_cfg(), CLASSNAMES, ref_env.clip).eval()
    pl = ref_dc.prompt_learner
    _, constants = build_prompt_learner(
        jax.random.PRNGKey(0), ref_env.params, CLASSNAMES, n_ctx=N_CTX
    )
    np.testing.assert_array_equal(
        np.asarray(constants["tokenized_prompts"]),
        pl.tokenized_prompts.numpy().astype(np.int32),
    )
    assert tuple(pl.name_lens) == constants["name_lens"]
    for ours, theirs in [
        (constants["token_prefix"], pl.token_prefix),
        (constants["token_suffix"], pl.token_suffix),
        (constants["token_suffix_nocls"], pl.token_suffix_nocls),
    ]:
        np.testing.assert_allclose(
            np.asarray(ours), theirs.numpy(), rtol=0, atol=1e-6
        )


@pytest.mark.parametrize("use_evidence", [True, False], ids=["evidence", "plain"])
def test_dense_train_forward_matches_reference(ref_env, use_evidence):
    """Texts-as-images train branch vs the reference DenseCLIP.forward
    (Caption_distill_double.py:473-545) on the same weights and captions."""
    from leclip_tpu.models.dense_clip import DenseFlags, dense_train_forward
    from leclip_tpu.models.prompt import build_prompt_learner
    import jax

    cfg = _make_cfg(use_evidence=use_evidence)
    ref_dc = ref_env.refcd.DenseCLIP(cfg, CLASSNAMES, ref_env.clip).eval()
    trainable = _copy_trainable(ref_dc.prompt_learner)
    _, constants = build_prompt_learner(
        jax.random.PRNGKey(0), ref_env.params, CLASSNAMES, n_ctx=N_CTX
    )
    toks_j, toks_t = _tokens(CAPTIONS)
    with torch.no_grad():
        ref_out = ref_dc(None, toks_t)
    flags = DenseFlags(use_evidence=use_evidence, spatial_scale_text=50.0)
    ours_global, ours_local = dense_train_forward(
        ref_env.params, ref_env.ccfg, trainable, constants, toks_j, flags
    )
    np.testing.assert_allclose(
        np.asarray(ours_global), ref_out[0].numpy(), rtol=1e-4, atol=3e-4
    )
    np.testing.assert_allclose(
        np.asarray(ours_local), ref_out[1].numpy(), rtol=1e-4, atol=3e-4
    )


def test_dense_train_ema_teacher_matches_reference(ref_env):
    """EMA branch: the reference's _momentum_update + no-grad teacher forward
    (Caption_distill_double.py:516-541) vs our ema_update + teacher logits."""
    from leclip_tpu.models.dense_clip import (
        DenseFlags, encode_captions, train_logits_from_features,
    )
    from leclip_tpu.models.prompt import build_prompt_learner, ema_update
    import jax

    cfg = _make_cfg(use_evidence=True, ema=True)
    ref_dc = ref_env.refcd.DenseCLIP(cfg, CLASSNAMES, ref_env.clip).eval()
    # perturb the teacher so the momentum update is non-trivial
    with torch.no_grad():
        g = torch.Generator().manual_seed(3)
        for p in ref_dc.prompt_learner_m.parameters():
            p.add_(0.05 * torch.randn(p.shape, generator=g))
    trainable = _copy_trainable(ref_dc.prompt_learner)
    ema0 = _copy_trainable(ref_dc.prompt_learner_m)
    _, constants = build_prompt_learner(
        jax.random.PRNGKey(0), ref_env.params, CLASSNAMES, n_ctx=N_CTX
    )
    toks_j, toks_t = _tokens(CAPTIONS)
    with torch.no_grad():
        ref_out = ref_dc(None, toks_t)  # runs _momentum_update internally
    flags = DenseFlags(use_evidence=True, spatial_scale_text=50.0)
    ema1 = ema_update(ema0, trainable, momentum=cfg.TRAIN.momentum)
    feats = encode_captions(ref_env.params, ref_env.ccfg, toks_j, flags)
    ours_m, ours_local_m = train_logits_from_features(
        ref_env.params, ref_env.ccfg, ema1, constants, feats, flags
    )
    assert ref_out[4] is not None
    np.testing.assert_allclose(
        np.asarray(ours_m), ref_out[4].numpy(), rtol=1e-4, atol=3e-4
    )
    np.testing.assert_allclose(
        np.asarray(ours_local_m), ref_out[5].numpy(), rtol=1e-4, atol=3e-4
    )


def test_dense_test_forward_matches_reference(ref_env):
    """Image-side test branch (dense v/c-proj map, no-pos attention pool,
    caption-bank retrieval augmentation, WTA/evidence aggregation) vs the
    reference DenseCLIP.forward(if_test=True) (Caption_distill_double.py
    :402-472), including the module-level caption bank it loaded at import."""
    from leclip_tpu.models.dense_clip import (
        DenseFlags, dense_test_forward, prompt_text_features,
    )
    from leclip_tpu.models.prompt import build_prompt_learner
    import jax

    cfg = _make_cfg(use_evidence=True)
    ref_dc = ref_env.refcd.DenseCLIP(cfg, CLASSNAMES, ref_env.clip).eval()
    trainable = _copy_trainable(ref_dc.prompt_learner)
    _, constants = build_prompt_learner(
        jax.random.PRNGKey(0), ref_env.params, CLASSNAMES, n_ctx=N_CTX
    )
    torch.manual_seed(11)
    img_t = torch.randn(2, 3, 64, 64) * 0.6
    with torch.no_grad():
        ref_logits, ref_local, ref_neg, _, ref_topk = ref_dc(img_t, if_test=True)

    flags = DenseFlags(use_evidence=True, spatial_scale_image=50.0)
    text_feats = prompt_text_features(
        ref_env.params, ref_env.ccfg, trainable, constants, flags
    )
    img_j = jnp.asarray(img_t.permute(0, 2, 3, 1).numpy())
    out = dense_test_forward(
        ref_env.params, ref_env.ccfg, trainable, text_feats, img_j, flags,
        caption_bank=jnp.asarray(ref_env.bank), topk=10,
    )
    np.testing.assert_allclose(
        np.asarray(out.topk_sim_scores), ref_topk.numpy(), rtol=1e-3, atol=2e-4
    )
    np.testing.assert_allclose(
        np.asarray(out.logits_global), ref_logits.numpy(), rtol=1e-3, atol=2e-3
    )
    np.testing.assert_allclose(
        np.asarray(out.logits_local), ref_local.numpy(), rtol=1e-3, atol=2e-3
    )
    # reference returns logits_neg as [P, B, C]
    np.testing.assert_allclose(
        np.asarray(out.logits_neg), ref_neg.permute(1, 0, 2).numpy(),
        rtol=1e-3, atol=2e-3,
    )


def test_reference_checkpoint_roundtrip(ref_env, tmp_path):
    """A checkpoint saved exactly as the reference's save_model writes it
    (prompt_learner state_dict incl. frozen token buffers, dassl
    torchtools.py:27-82) loads through models/convert.load_prompt_checkpoint
    into a trainable pytree equal to the source PromptLearner — the
    MIGRATION.md drop-in claim, exercised from the reference's own module."""
    from leclip_tpu.models.convert import load_prompt_checkpoint

    ref_dc = ref_env.refcd.DenseCLIP(_make_cfg(), CLASSNAMES, ref_env.clip)
    payload = {
        "state_dict": ref_dc.prompt_learner.state_dict(),
        "epoch": 7,
        "optimizer": None,
        "scheduler": None,
    }
    path = tmp_path / "model.pth.tar-7"
    torch.save(payload, path)
    trainable, epoch = load_prompt_checkpoint(str(path))
    assert epoch == 7
    want = _copy_trainable(ref_dc.prompt_learner)
    for f in TRAINABLE_FIELDS:
        np.testing.assert_allclose(
            np.asarray(trainable[f]), np.asarray(want[f]), rtol=0, atol=0
        )


# --------------------------- adapter variant ---------------------------------


@pytest.fixture(scope="module")
def adapter_env():
    """Tiny CLIP with transformer_width=512 — the reference's adapter
    hardcodes Adapter(512, 4) (Caption_distill_double_adapter.py:97)."""
    from tests import _refshim

    refada = _refshim.import_ref_module("trainers.Caption_distill_double_adapter")
    rm = _refshim.import_ref_module("clip.model")
    torch.manual_seed(1)
    clip_model = rm.CLIP(
        embed_dim=64, image_resolution=64, vision_layers=(1, 1, 1, 1),
        vision_width=8, vision_patch_size=None, context_length=77,
        vocab_size=49408, transformer_width=512, transformer_heads=8,
        transformer_layers=2,
    ).float().eval()
    from leclip_tpu.models.convert import convert_state_dict

    ccfg, params = convert_state_dict(
        {k: v.numpy() for k, v in clip_model.state_dict().items()}
    )
    return NS(refada=refada, clip=clip_model, ccfg=ccfg, params=params)


def _adapter_fixture_parts(adapter_env):
    """Build the reference AdapterDenseCLIP + lift its params into ours."""
    from leclip_tpu.models.prompt import build_prompt_learner
    import jax

    cfg = _make_cfg(use_evidence=False)
    ref_ad = adapter_env.refada.AdapterDenseCLIP(
        cfg, CLASSNAMES, adapter_env.clip
    ).eval()
    pl = ref_ad.prompt_learner
    trainable = {
        f: jnp.asarray(getattr(pl, f).detach().numpy())
        for f in ("ctx", "ctx_double", "temperature", "spatial_T", "ranking_scale")
    }
    trainable["ctx_evidence"] = jnp.zeros_like(trainable["ctx"])  # unused
    fc = ref_ad.adapter_text_encoder.text_adapter.fc
    adapter_params = {
        "down_kernel": jnp.asarray(fc[0].weight.detach().numpy().T),
        "up_kernel": jnp.asarray(fc[2].weight.detach().numpy().T),
    }
    _, constants = build_prompt_learner(
        jax.random.PRNGKey(0), adapter_env.params, CLASSNAMES, n_ctx=N_CTX
    )
    return ref_ad, trainable, adapter_params, constants


def test_adapter_train_forward_matches_reference(adapter_env):
    """AdapterDenseCLIP texts-as-images branch (plain tower for captions,
    adapter-augmented tower for prompts, no evidence/WTA) vs our adapter path
    (ref Caption_distill_double_adapter.py:415-457)."""
    from leclip_tpu.models.dense_clip import (
        DenseFlags, encode_captions, train_logits_from_features,
    )

    ref_ad, trainable, adapter_params, constants = _adapter_fixture_parts(adapter_env)
    toks_j, toks_t = _tokens(CAPTIONS)
    with torch.no_grad():
        ref_out = ref_ad(None, toks_t)
    flags = DenseFlags(use_evidence=False, spatial_scale_text=50.0)
    feats = encode_captions(adapter_env.params, adapter_env.ccfg, toks_j, flags)
    ours_global, ours_local = train_logits_from_features(
        adapter_env.params, adapter_env.ccfg, trainable, constants, feats,
        flags, adapter=adapter_params,
    )
    np.testing.assert_allclose(
        np.asarray(ours_global), ref_out[0].numpy(), rtol=1e-4, atol=3e-4
    )
    np.testing.assert_allclose(
        np.asarray(ours_local), ref_out[1].numpy(), rtol=1e-4, atol=3e-4
    )


def test_adapter_test_forward_matches_reference(adapter_env):
    """AdapterDenseCLIP image branch (dense map + no-pos pool, NO retrieval,
    plain spatial softmax) vs our test path with the adapter applied to the
    prompt features (ref Caption_distill_double_adapter.py:367-414)."""
    from leclip_tpu.models.dense_clip import (
        DenseFlags, dense_test_forward, prompt_text_features,
    )

    ref_ad, trainable, adapter_params, constants = _adapter_fixture_parts(adapter_env)
    torch.manual_seed(12)
    img_t = torch.randn(2, 3, 64, 64) * 0.6
    with torch.no_grad():
        ref_logits, ref_local, ref_neg, _ = ref_ad(img_t, if_test=True)
    flags = DenseFlags(use_evidence=False, spatial_scale_image=50.0)
    text_feats = prompt_text_features(
        adapter_env.params, adapter_env.ccfg, trainable, constants, flags,
        adapter=adapter_params,
    )
    img_j = jnp.asarray(img_t.permute(0, 2, 3, 1).numpy())
    out = dense_test_forward(
        adapter_env.params, adapter_env.ccfg, trainable, text_feats, img_j, flags
    )
    np.testing.assert_allclose(
        np.asarray(out.logits_global), ref_logits.numpy(), rtol=1e-3, atol=2e-3
    )
    np.testing.assert_allclose(
        np.asarray(out.logits_local), ref_local.numpy(), rtol=1e-3, atol=2e-3
    )
    np.testing.assert_allclose(
        np.asarray(out.logits_neg), ref_neg.permute(1, 0, 2).numpy(),
        rtol=1e-3, atol=2e-3,
    )


# ------------------------------- loss library --------------------------------


@pytest.fixture(scope="module")
def ref_losses():
    from tests import _refshim

    return _refshim.import_ref_module("trainers.utils")


@pytest.fixture(scope="module")
def loss_data():
    rng = np.random.default_rng(1)
    pred = rng.normal(size=(6, N_CLS * 3)).astype(np.float32)
    label = (rng.random((6, N_CLS * 3)) < 0.35).astype(np.float32)
    label[0] = 0.0
    label[1] = 1.0
    return pred, label


def _t(x):
    return torch.as_tensor(np.array(x, copy=True))


def test_ranking_losses_match_reference(ref_losses, loss_data):
    from leclip_tpu.ops import losses as L

    pred, label = loss_data
    rng = np.random.default_rng(2)
    got = float(L.ranking_loss(jnp.asarray(pred), jnp.asarray(label),
                               scale=1.0, margin=1.0))
    # NOTE: the reference mutates y_pred in place (utils.py:86) — fresh tensors
    want = float(ref_losses.ranking_loss(_t(pred), _t(label),
                                         scale_=1.0, margin_=1))
    np.testing.assert_allclose(got, want, rtol=1e-5)

    cooc = rng.random((pred.shape[1], pred.shape[1])).astype(np.float32) + 0.01
    got = float(L.ranking_loss_with_cooccurrence(
        jnp.asarray(pred), jnp.asarray(label), jnp.asarray(cooc),
        scale=1.0, margin=1.0))
    want = float(ref_losses.ranking_loss_with_cooccurrence(
        _t(pred), _t(label), _t(cooc), scale_=1.0, margin_=1))
    np.testing.assert_allclose(got, want, rtol=1e-5)

    cw = rng.random(pred.shape[1]).astype(np.float32) + 0.1
    got = float(L.ranking_loss_reweighting(
        jnp.asarray(pred), jnp.asarray(label), jnp.asarray(cw),
        scale=2.0, margin=1.0))
    want = float(ref_losses.ranking_loss_reweighting(
        _t(pred), _t(label), _t(cw), scale_=2.0, margin_=1))
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_ce_bce_focal_losses_match_reference(ref_losses, loss_data):
    from leclip_tpu.ops import losses as L

    pred, label = loss_data
    cases = [
        (L.soft_cross_entropy, ref_losses.soft_cross_entropy),
        (L.softmax_sigmoid_bce, ref_losses.softmax_sigmoid_BCEloss),
        (L.norm_logits_bce, ref_losses.norm_logits_BCEloss),
        (L.sigmoid_focal_loss, ref_losses.sigmoid_focal_loss),
    ]
    for ours, theirs in cases:
        got = float(ours(jnp.asarray(pred), jnp.asarray(label)))
        want = float(theirs(_t(pred), _t(label)))
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_asymmetric_losses_match_reference(ref_losses, loss_data):
    from leclip_tpu.ops import losses as L

    pred, label = loss_data
    got = float(L.dualcoop_loss(jnp.asarray(pred), jnp.asarray(label)))
    want = float(ref_losses.dualcoop_loss(_t(pred), None, _t(label)))
    np.testing.assert_allclose(got, want, rtol=1e-5)

    got = float(L.asl_loss(jnp.asarray(pred), jnp.asarray(label)))
    want = float(ref_losses.ASL_loss(_t(pred), _t(label)))
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_ema_kld_matches_reference_expression(loss_data):
    """The ×10000-weighted EMA distillation term exactly as composed in
    forward_backward (Caption_distill_double.py:805-815)."""
    import torch.nn.functional as F
    from leclip_tpu.ops import losses as L

    pred, _ = loss_data
    rng = np.random.default_rng(3)
    teacher = pred + rng.normal(size=pred.shape).astype(np.float32) * 0.3
    kl = torch.nn.KLDivLoss(reduction="batchmean")
    want = float(kl(F.log_softmax(_t(pred), dim=-1), F.softmax(_t(teacher), dim=-1)))
    got = float(L.kl_distill_loss(jnp.asarray(pred), jnp.asarray(teacher)))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-7)


def test_soft_margin_hinge_matches_reference(loss_data):
    from tests import _refshim
    from leclip_tpu.ops import losses as L

    csel = _refshim.import_ref_module("trainers.csel")
    rng = np.random.default_rng(4)
    B, C, T = 3, N_CLS, 7
    x = rng.normal(size=(B, C, T)).astype(np.float32)
    y = np.sign(rng.normal(size=(B, C, T))).astype(np.float32)
    counts = rng.integers(2, 40, size=(1, C)).astype(np.float32)
    ref_loss = csel.SoftMarginHingeEmbeddingLoss(
        margin=0.2, class_counts=torch.as_tensor(counts)
    )
    want = float(ref_loss(_t(x), _t(y)))
    got = float(L.soft_margin_hinge_loss(
        jnp.asarray(x), jnp.asarray(y), jnp.asarray(counts[0]), margin=0.2,
        gamma=2.0))
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_resample_loss_matches_reference(tmp_path, loss_data):
    """Distribution-Balanced Loss with the trainer's exact construction
    (Caption_distill_double.py:822-830) vs our resample_loss."""
    import pickle

    from tests import _refshim
    from leclip_tpu.ops import losses as L

    dbl = _refshim.import_ref_module("trainers.dbl")
    pred, label = loss_data
    rng = np.random.default_rng(5)
    class_freq = rng.integers(5, 60, size=pred.shape[1]).astype(np.float64)
    train_num = 200.0
    freq_file = tmp_path / "class_freq.pkl"
    with open(freq_file, "wb") as f:
        pickle.dump(
            {"class_freq": class_freq, "neg_class_freq": train_num - class_freq},
            f,
        )
    ref_loss = dbl.ResampleLoss(
        use_sigmoid=True,
        reweight_func="rebalance",
        focal=dict(focal=False, balance_param=2.0, gamma=2),
        logit_reg=dict(),
        map_param=dict(alpha=0.1, beta=10.0, gamma=0.2),
        loss_weight=1.0,
        freq_file=str(freq_file),
    )
    want = float(ref_loss(_t(pred), _t(label)))
    p = L.make_resample_loss_params(
        class_freq, train_num - class_freq, reweight_func="rebalance",
        map_alpha=0.1, map_beta=10.0, map_gamma=0.2,
    )
    got = float(L.resample_loss(jnp.asarray(pred), jnp.asarray(label), p))
    np.testing.assert_allclose(got, want, rtol=1e-4)


def test_gcn_matches_reference(tmp_path):
    """GC_module (2-layer, per-layer near-identity adjacency) vs our
    functional GCN with the reference's weights copied in (utils.py:195-292)."""
    from tests import _refshim
    from leclip_tpu.models.gcn import gcn_forward, init_gcn_params
    import jax

    ru = _refshim.import_ref_module("trainers.utils")
    C = N_CLS
    prob_file = tmp_path / "count_prob.pth"
    torch.save(torch.rand(C, C), prob_file)
    torch.manual_seed(6)
    gc = ru.GC_module(layers=2, init_prob=False, init_prob_file=str(prob_file))
    x = torch.randn(2, C, 1024)
    with torch.no_grad():
        want = gc(x).numpy()

    params = init_gcn_params(jax.random.PRNGKey(0), n_cls=C, dim=1024, layers=2)
    for ours_layer, theirs in zip(params["layers"], (gc.gc1, gc.gc2)):
        ours_layer["weight"] = jnp.asarray(theirs.weight.detach().numpy())
        ours_layer["A"] = jnp.asarray(theirs.A.detach().numpy())
    got = np.asarray(gcn_forward(params, jnp.asarray(x.numpy())))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


# --------------------------- LR schedule golden ------------------------------


_SCHED_CASES = [
    # (id, dassl cfg fields, our KEY VALUE opts)
    ("cosine", dict(LR_SCHEDULER="cosine", STEPSIZE=(-1,), MAX_EPOCH=10,
                    WARMUP_EPOCH=-1),
     ["OPTIM.SCHED", "cosine", "OPTIM.MAX_EPOCH", "10",
      "OPTIM.WARMUP_EPOCH", "-1"]),
    ("cosine-conswarm-norecount", dict(
        LR_SCHEDULER="cosine", STEPSIZE=(-1,), MAX_EPOCH=10, WARMUP_EPOCH=1,
        WARMUP_TYPE="constant", WARMUP_RECOUNT=False),
     ["OPTIM.SCHED", "cosine", "OPTIM.MAX_EPOCH", "10",
      "OPTIM.WARMUP_EPOCH", "1", "OPTIM.WARMUP_TYPE", "constant",
      "OPTIM.WARMUP_RECOUNT", "False"]),
    ("cosine-linwarm-norecount", dict(
        LR_SCHEDULER="cosine", STEPSIZE=(-1,), MAX_EPOCH=12, WARMUP_EPOCH=3,
        WARMUP_TYPE="linear", WARMUP_RECOUNT=False),
     ["OPTIM.SCHED", "cosine", "OPTIM.MAX_EPOCH", "12",
      "OPTIM.WARMUP_EPOCH", "3", "OPTIM.WARMUP_TYPE", "linear",
      "OPTIM.WARMUP_RECOUNT", "False"]),
    ("cosine-conswarm-recount", dict(
        LR_SCHEDULER="cosine", STEPSIZE=(-1,), MAX_EPOCH=10, WARMUP_EPOCH=2,
        WARMUP_TYPE="constant", WARMUP_RECOUNT=True),
     ["OPTIM.SCHED", "cosine", "OPTIM.MAX_EPOCH", "10",
      "OPTIM.WARMUP_EPOCH", "2", "OPTIM.WARMUP_TYPE", "constant",
      "OPTIM.WARMUP_RECOUNT", "True"]),
    ("single-step-periodic", dict(
        LR_SCHEDULER="single_step", STEPSIZE=(5,), MAX_EPOCH=18,
        WARMUP_EPOCH=-1),
     ["OPTIM.SCHED", "single_step", "OPTIM.STEPSIZE", "(5,)",
      "OPTIM.MAX_EPOCH", "18", "OPTIM.WARMUP_EPOCH", "-1"]),
    ("single-step-warm-norecount", dict(
        LR_SCHEDULER="single_step", STEPSIZE=(4,), MAX_EPOCH=16,
        WARMUP_EPOCH=2, WARMUP_TYPE="constant", WARMUP_RECOUNT=False),
     ["OPTIM.SCHED", "single_step", "OPTIM.STEPSIZE", "(4,)",
      "OPTIM.MAX_EPOCH", "16", "OPTIM.WARMUP_EPOCH", "2",
      "OPTIM.WARMUP_TYPE", "constant", "OPTIM.WARMUP_RECOUNT", "False"]),
    ("multi-step", dict(
        LR_SCHEDULER="multi_step", STEPSIZE=(4, 9), MAX_EPOCH=12,
        WARMUP_EPOCH=-1),
     ["OPTIM.SCHED", "multi_step", "OPTIM.STEPSIZE", "(4,9)",
      "OPTIM.MAX_EPOCH", "12", "OPTIM.WARMUP_EPOCH", "-1"]),
    ("multi-step-warm-norecount", dict(
        LR_SCHEDULER="multi_step", STEPSIZE=(2, 6), MAX_EPOCH=12,
        WARMUP_EPOCH=3, WARMUP_TYPE="constant", WARMUP_RECOUNT=False),
     ["OPTIM.SCHED", "multi_step", "OPTIM.STEPSIZE", "(2,6)",
      "OPTIM.MAX_EPOCH", "12", "OPTIM.WARMUP_EPOCH", "3",
      "OPTIM.WARMUP_TYPE", "constant", "OPTIM.WARMUP_RECOUNT", "False"]),
    ("multi-step-warm-recount", dict(
        LR_SCHEDULER="multi_step", STEPSIZE=(2, 6), MAX_EPOCH=12,
        WARMUP_EPOCH=3, WARMUP_TYPE="linear", WARMUP_RECOUNT=True),
     ["OPTIM.SCHED", "multi_step", "OPTIM.STEPSIZE", "(2,6)",
      "OPTIM.MAX_EPOCH", "12", "OPTIM.WARMUP_EPOCH", "3",
      "OPTIM.WARMUP_TYPE", "linear", "OPTIM.WARMUP_RECOUNT", "True"]),
]


@pytest.mark.parametrize(
    "refcfg,opts", [c[1:] for c in _SCHED_CASES], ids=[c[0] for c in _SCHED_CASES]
)
def test_lr_schedule_matches_dassl_scheduler(refcfg, opts):
    """Per-epoch LR values of the reference's executed build_lr_scheduler
    (torch SGD stepped at epoch end, dassl/optim/lr_scheduler.py:83-154,
    warmup wrappers :25-80) vs our analytic epoch_lr_schedule — including
    the WARMUP_RECOUNT=False phase-jump and periodic StepLR semantics."""
    from tests import _refshim
    from leclip_tpu.engine.config import setup_config
    from leclip_tpu.engine.train_state import epoch_lr_schedule

    mod = _refshim.load_ref_lr_scheduler()
    base = 0.01
    defaults = dict(GAMMA=0.1, WARMUP_TYPE="constant", WARMUP_CONS_LR=1e-5,
                    WARMUP_MIN_LR=1e-4, WARMUP_RECOUNT=True)
    cfg_fields = {**defaults, **refcfg}
    max_epoch = cfg_fields["MAX_EPOCH"]

    p = torch.nn.Parameter(torch.zeros(1))
    opt = torch.optim.SGD([p], lr=base)
    sched = mod.build_lr_scheduler(opt, NS(**cfg_fields))
    want = []
    for _ in range(max_epoch):
        want.append(opt.param_groups[0]["lr"])  # lr used DURING this epoch
        opt.step()
        sched.step()  # reference steps at epoch end (trainer.py:894-895)

    cfg = setup_config(opts=list(opts) + [
        "OPTIM.LR", str(base), "OPTIM.GAMMA", "0.1",
        "OPTIM.WARMUP_CONS_LR", "1e-5", "OPTIM.WARMUP_MIN_LR", "1e-4",
    ])
    lr_fn = epoch_lr_schedule(cfg.OPTIM, steps_per_epoch=7)
    got = [float(lr_fn(e * 7)) for e in range(max_epoch)]
    np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-12)


# --------------------------- optimizer trajectories --------------------------


_OPT_CASES = [
    # (id, our OPTIM.NAME + extra opts, torch construction kwargs-fn)
    ("sgd", "sgd", (), lambda LR, WD: dict(
        cls="SGD", lr=LR, momentum=0.9, weight_decay=WD)),
    ("sgd-nesterov", "sgd", ("OPTIM.SGD_NESTEROV", "True"), lambda LR, WD: dict(
        cls="SGD", lr=LR, momentum=0.9, weight_decay=WD, nesterov=True)),
    ("sgd-dampening", "sgd", ("OPTIM.SGD_DAMPNING", "0.3"), lambda LR, WD: dict(
        cls="SGD", lr=LR, momentum=0.9, weight_decay=WD, dampening=0.3)),
    ("adam", "adam", (), lambda LR, WD: dict(
        cls="Adam", lr=LR, weight_decay=WD, betas=(0.9, 0.999))),
    ("amsgrad", "amsgrad", (), lambda LR, WD: dict(
        cls="Adam", lr=LR, weight_decay=WD, betas=(0.9, 0.999), amsgrad=True)),
    ("rmsprop", "rmsprop", (), lambda LR, WD: dict(
        cls="RMSprop", lr=LR, momentum=0.9, weight_decay=WD, alpha=0.99)),
    ("adamw", "adamw", (), lambda LR, WD: dict(
        cls="AdamW", lr=LR, weight_decay=WD, betas=(0.9, 0.999))),
    ("radam", "radam", (), lambda LR, WD: dict(
        cls="ref_radam", lr=LR, weight_decay=WD, betas=(0.9, 0.999))),
]


@pytest.mark.parametrize(
    "name,extra,mk", [c[1:] for c in _OPT_CASES], ids=[c[0] for c in _OPT_CASES]
)
def test_optimizer_trajectory_matches_torch(name, extra, mk):
    """12-step parameter trajectories of our optax chains vs the torch
    optimizers the reference constructs (dassl/optim/optimizer.py:83-137 with
    its defaults; RAdam is dassl's vendored implementation) on identical
    gradients. Pins the weight-decay placement (grad-coupled everywhere
    except AdamW/RAdam), torch's raw-moment amsgrad max, RMSprop's
    eps-outside-sqrt + momentum buffer, and SGD dampening/nesterov."""
    import importlib.util

    from leclip_tpu.engine.config import setup_config
    from leclip_tpu.engine.train_state import build_optimizer
    import jax

    LR, WD, STEPS = 0.05, 5e-4, 12
    rng = np.random.default_rng(0)
    p0 = rng.normal(size=7).astype(np.float32)
    grads = [rng.normal(size=7).astype(np.float32) for _ in range(STEPS)]

    kw = mk(LR, WD)
    cls = kw.pop("cls")
    if cls == "ref_radam":
        spec = importlib.util.spec_from_file_location(
            "ref_radam",
            os.path.join(REFERENCE_ROOT,
                         "project/my_code/Dassl.pytorch-master/dassl/optim/radam.py"),
        )
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
        opt_cls = mod.RAdam
    else:
        opt_cls = getattr(torch.optim, cls)
    p = torch.nn.Parameter(torch.tensor(np.float64(p0)))
    opt = opt_cls([p], **kw)
    for g in grads:
        p.grad = torch.tensor(np.float64(g))
        opt.step()
    want = p.detach().numpy()

    cfg = setup_config(opts=[
        "OPTIM.NAME", name, "OPTIM.LR", str(LR), "OPTIM.WEIGHT_DECAY", str(WD),
        "OPTIM.SCHED", "constant", "OPTIM.WARMUP_EPOCH", "-1", *extra,
    ])
    tx = build_optimizer(cfg.OPTIM, steps_per_epoch=100)
    params = {"p": jnp.asarray(p0)}
    state = tx.init(params)
    for g in grads:
        upd, state = tx.update({"p": jnp.asarray(g)}, state, params)
        params = jax.tree.map(lambda a, b: a + b, params, upd)
    got = np.asarray(params["p"], np.float64)
    # radam's rectification term amplifies fp32 rounding in the early steps
    # (the same comparison under jax_enable_x64 agrees to 1.4e-7, so the
    # semantics are exact; our optax chain runs fp32 here)
    rtol = 2e-3 if name == "radam" else 2e-5
    np.testing.assert_allclose(got, want, rtol=rtol, atol=2e-6)


# ------------------------- sampler shard contract ----------------------------


def test_distributed_shard_contract_matches_reference():
    """CustomDistributedSamplerWrapper's executed sharding (contiguous
    len//world slice of the inner sampler's order, remainder dropped —
    dassl/data/samplers.py:181-195) vs CaptionBatcher's shard slices."""
    import importlib.util

    from leclip_tpu.data.loader import CaptionBatcher

    spec = importlib.util.spec_from_file_location(
        "ref_samplers",
        os.path.join(REFERENCE_ROOT,
                     "project/my_code/Dassl.pytorch-master/dassl/data/samplers.py"),
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)

    n, world = 23, 4
    dataset = list(range(n))
    inner = torch.utils.data.SequentialSampler(dataset)
    ref_shards = [
        list(mod.CustomDistributedSamplerWrapper(
            dataset, inner, num_replicas=world, rank=r))
        for r in range(world)
    ]
    tokens = np.arange(n)[:, None]
    labels = np.zeros((n, 2))
    got_shards = []
    for r in range(world):
        b = CaptionBatcher(tokens, labels, batch_size=n, shuffle=False,
                           shard_index=r, num_shards=world)
        got = [int(t[0]) for batch in b.epoch(0) for t in batch["img"]]
        # the batcher wraps the final partial batch up to batch_size; the
        # underlying shard is its first len//world entries
        got_shards.append(got[: n // world])
    assert got_shards == ref_shards
    # remainder dropped identically: union covers world*(n//world) samples
    assert sorted(x for s in ref_shards for x in s) == list(range(world * (n // world)))

    # set_epoch passes through to the inner sampler (samplers.py:193-195)
    class _Recording(list):
        def set_epoch(self, e):
            self.epoch = e

    rec = _Recording(range(n))
    w = mod.CustomDistributedSamplerWrapper(dataset, rec, num_replicas=world, rank=0)
    w.set_epoch(7)
    assert rec.epoch == 7


# ---------------------------- tokenize() wrapper -----------------------------


def test_tokenize_wrapper_matches_reference():
    """clip.tokenize's framing (SOT/EOT, zero padding, truncate-forces-EOT)
    executed from the reference's clip/clip.py vs our tokenize()."""
    from tests import _refshim
    from leclip_tpu.data.tokenizer import tokenize

    ref_clip = _refshim.import_ref_module("clip.clip")
    texts = [
        "a photo of a dog.",
        "A Person riding a horse next to a stop sign!",
        "",
    ]
    want = ref_clip.tokenize(texts).numpy()
    got = np.asarray(tokenize(texts))
    np.testing.assert_array_equal(got, want.astype(got.dtype))

    long_text = "a very crowded street scene " * 30
    want = ref_clip.tokenize([long_text], truncate=True).numpy()
    got = np.asarray(tokenize([long_text], truncate=True))
    np.testing.assert_array_equal(got, want.astype(got.dtype))


# ------------------------------ evaluator mAP --------------------------------


def test_map_matches_reference_evaluator():
    """Our numpy AP vs the Dassl evaluator's own average_precision/mAP
    (dassl/evaluation/evaluator.py:137-175), executed from its source."""
    from tests._refshim import extract_functions
    from leclip_tpu.engine.evaluator import mAP as our_map

    path = os.path.join(
        REFERENCE_ROOT,
        "project/my_code/Dassl.pytorch-master/dassl/evaluation/evaluator.py",
    )
    ns = extract_functions(path, ["average_precision", "mAP"])
    rng = np.random.default_rng(8)
    preds = rng.normal(size=(40, 6))
    targs = (rng.random((40, 6)) < 0.3).astype(np.float64)
    targs[:, 4] = 0.0  # an empty class exercises the epsilon guard
    want = float(ns["mAP"](targs, preds))
    got = float(our_map(targs, preds))
    np.testing.assert_allclose(got, want, rtol=1e-8)


# --------------------------- gen_final_ans (L5) ------------------------------


def test_gen_final_ans_script_end_to_end(tmp_path):
    """Run the reference's ACTUAL gen_final_ans.py (module-level script:
    loads .pth dumps, fuse/fuse6, per-class routing, writes impreds.json) on
    synthetic dumps and assert our generate_final_answers produces the same
    file contents."""
    from leclip_tpu.ops.ensemble import generate_final_answers

    my_code = tmp_path / "my_code"
    (my_code / "train_output").mkdir(parents=True)
    (tmp_path / "output").mkdir()
    N, NB, C = 7, 9, 80
    rng = np.random.default_rng(9)

    def blob():
        return {
            "output": rng.normal(size=(N, C)).astype(np.float32),
            "output_pos": rng.normal(size=(N, C)).astype(np.float32),
            "output_blocks": rng.normal(size=(N, NB, C)).astype(np.float32),
            "output_pos_blocks": rng.normal(size=(N, NB, C)).astype(np.float32),
        }

    names = ("best", "ema", "zema", "diff", "diffh", "difft")
    data = {name: blob() for name in names}
    sims_blocks = (rng.random((N, NB, 5)) * 0.4).astype(np.float32)

    def as_torch(d):
        return {k: torch.as_tensor(v) for k, v in d.items()}

    torch.save({n: as_torch(data[n]) for n in ("zema", "diff", "diffh")},
               my_code / "train_output" / "data.pth")
    torch.save({"ema": as_torch(data["ema"])},
               my_code / "train_output" / "data_ema.pth")
    torch.save({"best": as_torch(data["best"]), "difft": as_torch(data["difft"])},
               my_code / "train_output" / "data_evidence.pth")
    torch.save(
        {
            "sims_all": torch.as_tensor(sims_blocks[:, 0, :]),
            "sims_blocks_all": torch.as_tensor(sims_blocks),
        },
        my_code / "train_output" / "sim_matrix_B.pth",
    )

    script = os.path.join(REFERENCE_ROOT, "project/my_code/gen_final_ans.py")
    cwd = os.getcwd()
    os.chdir(my_code)
    try:
        runpy.run_path(script, run_name="__main__")
    finally:
        os.chdir(cwd)
    with open(tmp_path / "output" / "impreds.json") as f:
        want = np.asarray(json.load(f), np.float64)

    ours = generate_final_answers(data, sims_blocks)
    np.testing.assert_allclose(np.asarray(ours, np.float64), want,
                               rtol=1e-4, atol=1e-5)


# ------------------------- crop-factory geometry -----------------------------


@pytest.mark.parametrize("hw", [(37, 53), (64, 48), (60, 90)])
def test_crop_factory_matches_reference_execution(hw):
    """Execute the reference's DatasetWrapperWithBlock._transform_image
    (dassl/data/data_manager.py:311-492) on a random uint8 image and assert
    every produced crop's CONTENT equals the window our box geometry
    (ops/crops.py sliding_window_boxes) selects, including reflect padding
    and edge clamping, in the same order."""
    from PIL import Image

    from tests import _refshim
    from leclip_tpu.ops.crops import sliding_window_boxes

    _refshim.install_shims()
    import torchvision.transforms.functional as F  # the shim

    path = os.path.join(
        REFERENCE_ROOT,
        "project/my_code/Dassl.pytorch-master/dassl/data/data_manager.py",
    )

    class _Base:  # stand-in for DatasetWrapper (base class never invoked)
        pass

    ns = _refshim.extract_functions(
        path, ["DatasetWrapperWithBlock"],
        extra_globals={"DatasetWrapper": _Base, "F": F},
    )
    wrapper = object.__new__(ns["DatasetWrapperWithBlock"])
    wrapper.multi_scale = [2, 3]
    wrapper.k_tfm = 1

    h, w = hw
    rng = np.random.default_rng(h * 100 + w)
    img_np = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
    img0 = Image.fromarray(img_np)

    crops = []

    def tfm(pil):
        crops.append(np.asarray(pil).copy())
        return torch.zeros(1)

    wrapper._transform_image(tfm, img0)
    ref_crops = crops[1:]  # crops[0] is the whole-image transform

    boxes, counts = sliding_window_boxes(h, w, (2, 3))
    assert len(ref_crops) == len(boxes) == sum(counts)
    pad_b = int(max(0.0, float(boxes[:, 2].max()) - h))
    pad_r = int(max(0.0, float(boxes[:, 3].max()) - w))
    padded = np.pad(img_np, ((0, pad_b), (0, pad_r), (0, 0)), mode="reflect")
    for k, box in enumerate(boxes.astype(int)):
        y0, x0, y1, x1 = box
        np.testing.assert_array_equal(
            ref_crops[k], padded[y0:y1, x0:x1],
            err_msg=f"crop {k} box {box.tolist()}",
        )


# ------------------------------- CustomCLIP ----------------------------------


def test_custom_clip_forwards_match_reference(ref_env):
    """The global-only CustomCLIP variant (Caption_distill_double.py:310-352),
    BOTH branches, executed from the reference's own class vs our standalone
    custom_clip_train_forward / custom_clip_test_forward (the trainer's
    TRAIN.MODEL='CustomCLIP' head computes the same train logits through its
    fused caption path; these pure functions are the reference-shaped API)."""
    import jax

    from leclip_tpu.models.dense_clip import (
        DenseFlags,
        custom_clip_test_forward,
        custom_clip_train_forward,
        prompt_text_features,
    )
    from leclip_tpu.models.prompt import build_prompt_learner

    ref_cc = ref_env.refcd.CustomCLIP(
        _make_cfg(use_evidence=False), CLASSNAMES, ref_env.clip
    ).eval()
    # The reference's CustomCLIP is broken AS SHIPPED: PromptLearner.forward
    # always returns 6 values (:309) but CustomCLIP.forward unpacks 5
    # (:327,:341) — dead code in the shipped configs (no recipe selects
    # TRAIN.MODEL='CustomCLIP'), same class of latent bug as filter_cap's
    # tqdm import. Bridge ONLY the arity (drop the trailing ranking_scale);
    # all math below still runs from the reference's source.
    pl = ref_cc.prompt_learner
    orig_forward = pl.forward
    pl.forward = lambda *a, **k: orig_forward(*a, **k)[:5]
    trainable = _copy_trainable(pl)
    _, constants = build_prompt_learner(
        jax.random.PRNGKey(0), ref_env.params, CLASSNAMES, n_ctx=N_CTX
    )
    flags = DenseFlags(use_evidence=False)

    # train branch: caption EOT features vs positive prompt features (:339-352)
    toks_j, toks_t = _tokens(CAPTIONS)
    with torch.no_grad():
        ref_train = ref_cc(None, toks_t)[0]
    ours_train, ours_local = custom_clip_train_forward(
        ref_env.params, ref_env.ccfg, trainable, constants, toks_j, flags
    )
    assert ours_local is None
    np.testing.assert_allclose(
        np.asarray(ours_train), ref_train.numpy(), rtol=1e-4, atol=3e-4
    )

    # test branch: pooled image features (pos-emb ON — the plain encode_image
    # path, :323-336) vs the same prompt features
    rng = np.random.default_rng(3)
    imgs = rng.normal(size=(2, 3, 64, 64)).astype(np.float32)
    with torch.no_grad():
        ref_test = ref_cc(torch.as_tensor(imgs), None, if_test=True)[0]
    feats = prompt_text_features(
        ref_env.params, ref_env.ccfg, trainable, constants, flags,
        include_evidence=False,
    )
    ours_test, _ = custom_clip_test_forward(
        ref_env.params, ref_env.ccfg, trainable, feats,
        jnp.asarray(imgs.transpose(0, 2, 3, 1)), flags,
    )
    np.testing.assert_allclose(
        np.asarray(ours_test), ref_test.numpy(), rtol=1e-4, atol=2e-3
    )


def test_clip_similarity_matches_reference_forward(ref_env):
    """The contrastive CLIP.forward (clip/model.py:394-408): L2-normalised
    features, exp(logit_scale)-scaled cosine logits both ways."""
    from leclip_tpu.models.clip import clip_similarity

    rng = np.random.default_rng(5)
    imgs = rng.normal(size=(2, 3, 64, 64)).astype(np.float32)
    toks_j, toks_t = _tokens(CAPTIONS[:2])
    with torch.no_grad():
        ref_i, ref_t = ref_env.clip(torch.as_tensor(imgs), toks_t)
    ours_i, ours_t = clip_similarity(
        ref_env.params, ref_env.ccfg, jnp.asarray(imgs.transpose(0, 2, 3, 1)),
        toks_j,
    )
    np.testing.assert_allclose(np.asarray(ours_i), ref_i.numpy(), rtol=1e-4, atol=2e-3)
    np.testing.assert_allclose(np.asarray(ours_t), ref_t.numpy(), rtol=1e-4, atol=2e-3)
