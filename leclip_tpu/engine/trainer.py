"""Caption-distillation trainer — the prompt-tuning training loop.

Capability parity with the reference trainer (ref: project/my_code/trainers/
Caption_distill_double.py:565-948 + Dassl dassl/engine/trainer.py):

* one jitted ``train_step`` covering the loss switch (double_ranking with the
  EMA-KLD ×10000 local term, soft_ce, dbl/ResampleLoss,
  ranking_with_cooccurrence, optional LMPT hinge add-on)
* EMA twin updated with momentum 0.995 BEFORE the teacher forward, exactly
  the reference's `_momentum_update`-inside-forward ordering
* per-epoch cosine LR (stepped at epoch end), early-stop, NaN detection,
  per-epoch prompt-only checkpoints in ``{OUTPUT_DIR}/{name}/``
* data-parallel over a 1-D device mesh: batch sharded, params replicated,
  gradient all-reduce inserted by XLA (replaces DDP/NCCL)

TPU-first: the frozen caption text-encode is computed once per step in the
same jit as both student and teacher heads; everything runs as a single XLA
program per step.
"""

from __future__ import annotations

import time
from functools import partial
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..data.datasets import CaptionDataset, build_dataset
from ..data.loader import CaptionBatcher
from ..models.clip import CLIPConfig
from ..models.dense_clip import (
    DenseFlags,
    encode_captions,
    train_logits_from_features,
)
from ..models.prompt import assemble_prompts, build_prompt_learner, ema_update
from ..ops import losses as L
from ..parallel.mesh import data_mesh, prefetch_sharded, replicate, shard_batch
from ..parallel.multihost import is_primary
from ..utils.logging import MetricMeter, profiler_trace
from ..utils.registry import TRAINER_REGISTRY
from .metrics import MetricsWriter
from .checkpoint import resume_if_exists, save_checkpoint
from .config import Config
from .train_state import TrainState, build_optimizer, create_train_state, epoch_lr_schedule


def flags_from_config(cfg: Config) -> DenseFlags:
    return DenseFlags(
        use_evidence=cfg.TRAINER.use_evidence,
        learn_scale=cfg.TRAIN.IF_LEARN_SCALE,
        learn_spatial_scale=cfg.TRAIN.IF_LEARN_spatial_SCALE,
        spatial_scale_text=float(cfg.TRAIN.spatial_SCALE_text),
        spatial_scale_image=float(cfg.TRAIN.spatial_SCALE_image),
    )


def make_train_step(
    clip_params: dict,
    clip_cfg: CLIPConfig,
    constants: dict,
    optimizer: optax.GradientTransformation,
    flags: DenseFlags,
    loss_name: str = "double_ranking",
    model_kind: str = "DenseCLIP",
    ema: bool = False,
    momentum: float = 0.995,
    co_matrix: Optional[jnp.ndarray] = None,
    resample_params=None,
    lmpt: bool = False,
    lmpt_lambda: float = 0.5,
    lmpt_class_counts: Optional[jnp.ndarray] = None,
    m_ctx: int = 2,
    adapter: Optional[dict] = None,
    adapter_trainable: bool = False,
    caption_q8: Optional[dict] = None,
    caption_fused: bool = False,
):
    """Build the jitted (state, captions, labels) → (state, metrics) step.

    ``caption_q8``: int8 text-tower weights for the FROZEN caption branch
    (TRAIN.int8_captions) — ~1.5× faster caption encoding; the prompt branch
    keeps full precision (gradients flow through it).
    ``caption_fused``: run the frozen caption branch through the bf16
    fused-block kernels (ops/block_kernels.py) — at caption shapes they beat
    both XLA and int8 (scripts/probe_text_fused.py) with no quantization
    noise. Safe under stop_gradient only; ignored when caption_q8 is set."""

    def head(params, caption_feats, clip_p):
        # adapter variant: the adapter rides the prompt path only; when
        # trainable it lives inside the param pytree under '_adapter'
        adp = params.get("_adapter", adapter) if adapter_trainable else adapter
        prompt_params = {k: v for k, v in params.items() if k != "_adapter"}
        out, out_local = train_logits_from_features(
            clip_p, clip_cfg, prompt_params, constants, caption_feats, flags,
            adapter=adp,
        )
        if model_kind == "CustomCLIP":
            return out, None  # global-only variant (ref CustomCLIP :338-352)
        return out, out_local

    def compute_loss(params, caption_feats, labels, teacher, captions, clip_p):
        out, out_local = head(params, caption_feats, clip_p)
        aux: Dict[str, jnp.ndarray] = {}
        if loss_name == "double_ranking":
            r_loss = L.ranking_loss(out, labels, scale=1.0, margin=1.0)
            if out_local is not None:
                r_loss = r_loss + L.ranking_loss(out_local, labels, scale=1.0, margin=1.0)
            if teacher is not None:
                t_out, t_local = teacher
                ema_loss = L.kl_distill_loss(out, t_out) + L.kl_distill_loss(
                    out_local, t_local
                ) * 10000.0
                aux["r_loss"] = r_loss
                aux["ema_loss"] = ema_loss
                loss = r_loss + ema_loss
            else:
                loss = r_loss
        elif loss_name == "soft_ce":
            loss = L.soft_cross_entropy(out, labels)
        elif loss_name == "dbl":
            loss = L.resample_loss(out, labels, resample_params)
            if out_local is not None:
                loss = loss + L.resample_loss(out_local, labels, resample_params)
        elif loss_name == "ranking_with_cooccurrence":
            loss = L.ranking_loss_with_cooccurrence(out, labels, co_matrix)
            if out_local is not None:
                loss = loss + L.ranking_loss_with_cooccurrence(out_local, labels, co_matrix)
        else:
            raise NotImplementedError(f"loss function {loss_name!r}")

        if lmpt:
            caption_embeds = clip_p["text"]["token_embedding"][captions]
            prompt_embeds = assemble_prompts(params, constants)[0]
            hinge = L.lmpt_hinge_from_embeddings(
                caption_embeds, prompt_embeds, labels, lmpt_class_counts, m_ctx=m_ctx
            )
            aux["loss_lmpt"] = hinge
            loss = lmpt_lambda * loss + (1.0 - lmpt_lambda) * hinge
        aux["loss"] = loss
        return loss, aux

    # clip params (and the int8 caption stack) enter as arguments (closed-over
    # arrays become HLO constants — enormous compile-time cost on big towers)
    @partial(jax.jit, donate_argnums=(2,))
    def _step(clip_p, q8, state: TrainState, captions: jnp.ndarray, labels: jnp.ndarray):
        caption_feats = encode_captions(
            clip_p, clip_cfg, captions, flags, q8=q8,
            fused=caption_fused and q8 is None,
        )
        if ema:
            # momentum update BEFORE the teacher forward (reference ordering)
            ema_params = ema_update(state.ema_params, state.params, momentum)
            teacher = jax.lax.stop_gradient(
                head(ema_params, caption_feats, clip_p)
            )
        else:
            ema_params = state.ema_params
            teacher = None
        (loss, aux), grads = jax.value_and_grad(compute_loss, has_aux=True)(
            state.params, caption_feats, labels, teacher, captions, clip_p
        )
        updates, opt_state = optimizer.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        new_state = TrainState(state.step + 1, params, ema_params, opt_state)
        return new_state, aux

    def train_step(state, captions, labels):
        return _step(clip_params, caption_q8, state, captions, labels)

    return train_step


@TRAINER_REGISTRY.register(name="Caption_distill_double")
class CaptionDistillTrainer:
    """Owner of dataset, prompt state, optimizer, and the train loop."""

    def __init__(
        self,
        cfg: Config,
        clip_params: dict,
        clip_cfg: CLIPConfig,
        dataset: Optional[CaptionDataset] = None,
        mesh=None,
        seed_key: Optional[jax.Array] = None,
    ):
        self.cfg = cfg
        self.clip_cfg = clip_cfg
        self.mesh = mesh if mesh is not None else data_mesh()
        self.dataset = dataset if dataset is not None else build_dataset(cfg)
        self.flags = flags_from_config(cfg)
        self.model_name = cfg.TEST.multi_model[0]

        key = seed_key if seed_key is not None else jax.random.PRNGKey(cfg.SEED)
        self.trainable, self.constants = build_prompt_learner(
            key, clip_params, self.dataset.classnames,
            n_ctx=cfg.TRAINER.N_CTX, csc=cfg.TRAINER.CSC,
            ctx_init=cfg.TRAINER.CTX_INIT,
            class_token_position=cfg.TRAINER.CLASS_TOKEN_POSITION,
        )
        if cfg.TRAINER.PREC in ("bf16", "amp-bf16"):
            # frozen towers in bf16 on the MXU; trainable prompt params and
            # LayerNorm statistics stay fp32 (the PREC=fp16/amp analogue,
            # ref Caption_distill_double.py:746-748,795-802)
            clip_params = jax.tree.map(
                lambda x: x.astype(jnp.bfloat16)
                if hasattr(x, "dtype") and x.dtype == jnp.float32 else x,
                clip_params,
            )
        self.clip_params = replicate(clip_params, self.mesh)
        self.constants = replicate(self.constants, self.mesh)

        # Labeled accuracy probe: every Nth caption is HELD OUT of training
        # and scored by validate() through the texts-as-images forward. The
        # competition val images are unlabeled (mAP 0 by construction), so
        # this is the run's only real accuracy signal without real data.
        tokens = np.asarray(self.dataset.tokens)
        labels = np.asarray(self.dataset.labels)
        self.probe_tokens = self.probe_labels = None
        n_probe = cfg.TRAIN.probe_holdout
        if n_probe > 0 and len(tokens) >= 2 * n_probe:
            hold = np.arange(0, len(tokens), n_probe)
            keep = np.setdiff1d(np.arange(len(tokens)), hold)
            self.probe_tokens = tokens[hold]
            self.probe_labels = labels[hold]
            tokens, labels = tokens[keep], labels[keep]
            print(f"probe holdout: {len(hold)} captions held out of training")
        # multi-host: each process loads only its contiguous shard of every
        # epoch permutation (per-rank batch = BATCH_SIZE_TRAIN, DDP
        # semantics); shard_batch then assembles the global sharded array
        self.batcher = CaptionBatcher(
            tokens, labels,
            batch_size=cfg.DATALOADER.BATCH_SIZE_TRAIN, seed=cfg.SEED,
            shard_index=jax.process_index(), num_shards=jax.process_count(),
        )
        steps = self.batcher.steps_per_epoch()
        self.optimizer = build_optimizer(cfg.OPTIM, steps)
        self.lr_fn = epoch_lr_schedule(cfg.OPTIM, steps)
        self.state = create_train_state(self.trainable, self.optimizer)
        self.state = replicate(self.state, self.mesh)

        co_matrix = None
        resample_params = None
        lmpt_counts = None
        if cfg.TRAIN.LOSSFUNC == "ranking_with_cooccurrence":
            # auto-load freq stats (the reference loads freq_stats.pkl itself,
            # Caption_distill_double.py:842-850); falls back to building the
            # co-occurrence from the training labels when the pkl is absent
            co_matrix = jnp.asarray(self._load_cooccurrence(), jnp.float32)
        if cfg.TRAIN.LOSSFUNC == "dbl" or cfg.TRAIN.LMPT:
            from ..data.corpora import load_class_freq

            freq = load_class_freq(self.dataset.caption_root, str(cfg.TRAIN.Caption_name))
            resample_params = L.make_resample_loss_params(
                freq["class_freq"], freq["neg_class_freq"]
            )
            lmpt_counts = jnp.asarray(freq["class_freq"], jnp.float32)

        caption_q8 = None
        if cfg.TRAIN.int8_captions:
            # W8A8 text tower for the FROZEN caption branch only (the prompt
            # branch carries gradients and keeps full precision). Opt-in;
            # the 512-wide text geometry is task-gate-validated (delta
            # 0.047, quant_gate_realwidth.json) but 768-wide text BREACHES
            # the ±0.2 bound — warn there.
            from ..ops.quant import quantize_stack_on_device

            if clip_cfg.transformer_width > 512:
                import warnings

                warnings.warn(
                    f"TRAIN.int8_captions at text width "
                    f"{clip_cfg.transformer_width}: the real-geometry gate "
                    "measured 768-wide causal text outside the ±0.2 "
                    "probe-mAP bound (quant_gate_realwidth.json) — prefer "
                    "the fused bf16 caption branch for >512-wide towers"
                )

            caption_q8 = quantize_stack_on_device(
                self.clip_params["text"]["blocks"], mesh=self.mesh
            )

        # fused bf16 caption branch: on by default where it applies — TPU
        # backend (pallas kernels; interpret mode on CPU is slower than XLA),
        # bf16 frozen towers, no int8 override. Pure fusion, no quant noise.
        blocks_dtype = self.clip_params["text"]["blocks"]["ln_1"]["scale"].dtype
        caption_fused = (
            cfg.TRAIN.fused_captions
            and caption_q8 is None
            and jax.default_backend() == "tpu"
            and blocks_dtype == jnp.bfloat16
        )

        self._step_kwargs = dict(
            loss_name=cfg.TRAIN.LOSSFUNC, model_kind=cfg.TRAIN.MODEL,
            ema=cfg.TRAIN.ema, momentum=cfg.TRAIN.momentum,
            co_matrix=co_matrix, resample_params=resample_params,
            lmpt=cfg.TRAIN.LMPT, lmpt_lambda=cfg.TRAIN.LMPT_LAMBDA,
            lmpt_class_counts=lmpt_counts, m_ctx=cfg.TRAINER.M_CTX,
            caption_q8=caption_q8, caption_fused=caption_fused,
        )
        self.train_step = make_train_step(
            self.clip_params, clip_cfg, self.constants, self.optimizer, self.flags,
            **self._step_kwargs,
        )

    def _load_cooccurrence(self) -> np.ndarray:
        """Row-normalised P(j|i) for the ranking_with_cooccurrence loss.

        Prefers a `freq_stats.pkl` next to the caption corpora (the artifact
        the reference ships at project/my_code/freq_stats.pkl); otherwise
        builds the counts from this dataset's own training labels."""
        import os

        from ..data.freq_stats import build_freq_stats, load_freq_stats

        root = str(getattr(self.dataset, "caption_root", "") or ".")
        path = os.path.join(root, "freq_stats.pkl")
        if os.path.exists(path):
            stats = load_freq_stats(path)
        else:
            stats = build_freq_stats(np.asarray(self.dataset.labels))
        from ..ops.ensemble import normalized_cooccurrence

        # the shared eval-side normalisation, with empty-class input guards
        # (nums clamped to 1; rows with zero co-occurrence get a uniform-safe
        # epsilon) so training and adjust_predictions can never diverge
        adj = np.asarray(stats["adj"], np.float64)
        nums = np.maximum(np.asarray(stats["nums"], np.float64), 1.0)
        adj = adj + 1e-12  # keeps all row sums positive
        return normalized_cooccurrence(adj, nums).astype(np.float32)

    def set_cooccurrence(self, co_matrix: np.ndarray):
        """Install the freq_stats co-occurrence matrix for the
        ranking_with_cooccurrence loss (rebuilds the step closure, keeping
        every other loss artifact)."""
        self._step_kwargs["co_matrix"] = jnp.asarray(co_matrix, jnp.float32)
        self.train_step = make_train_step(
            self.clip_params, self.clip_cfg, self.constants, self.optimizer,
            self.flags, **self._step_kwargs,
        )

    # ------------------------------ loop ------------------------------------

    def train(self, resume: bool = True) -> TrainState:
        cfg = self.cfg
        start_epoch = 0
        if resume and cfg.RESUME:
            self.state, start_epoch = resume_if_exists(
                self.state, cfg.RESUME, self.model_name
            )
        max_epoch = cfg.OPTIM.MAX_EPOCH
        meter = MetricMeter()
        # rank-0 gate for everything that persists or prints (reference:
        # rank-gated checkpointing Caption_distill_double.py:576-587 and
        # printing dassl/engine/trainer.py:656); every process computes the
        # identical replicated state, exactly one writes it.
        primary = is_primary()
        writer = MetricsWriter(cfg.OUTPUT_DIR) if (cfg.OUTPUT_DIR and primary) else None
        t_start = time.time()
        # Host-sync cadence (TRAIN.sync_every; 0 = auto). The metrics fetch is
        # the only real sync on this runtime (block_until_ready does not wait
        # over the tunnel), and fetching every step serialises the ~32 ms
        # dispatch round trip with compute. TPU auto: sync at PRINT_FREQ
        # boundaries so up to PRINT_FREQ steps pipeline on-device (measured
        # RN50 @1024: 139.5 → 112.5 ms/step); NaN detection (reference
        # detect_anomaly) lags by ≤ sync_every steps. Non-TPU auto keeps the
        # per-step sync: the CPU in-process communicator deadlocks past
        # ~hundreds of queued collectives, and tests want immediate NaNs.
        print_freq = max(cfg.TRAIN.PRINT_FREQ, 1)
        sync_every = cfg.TRAIN.sync_every
        if sync_every <= 0:
            sync_every = print_freq if jax.default_backend() == "tpu" else 1
        steps_per_epoch = self.batcher.steps_per_epoch()
        # Bounded jax.profiler window (TRAIN.profile_dir): first-epoch steps
        # [1, min(5, last)] — step 0 is compile — written as a TensorBoard-
        # loadable trace. The SURVEY §5 tracing upgrade over the reference's
        # wall-clock meters.
        profiling = bool(cfg.TRAIN.profile_dir) and primary
        prof_start = 1 if steps_per_epoch > 1 else 0
        prof_stop = min(5, steps_per_epoch - 1) if steps_per_epoch > 1 else 0
        try:
            self._train_epochs(
                cfg, start_epoch, max_epoch, meter, primary, writer,
                sync_every, print_freq, steps_per_epoch, t_start,
                profiling, prof_start, prof_stop,
            )
        finally:
            # an exception inside the profiled window (e.g. the NaN guard)
            # must still finalize the trace — a dangling start_trace breaks
            # every later start_trace in the process
            if getattr(self, "_prof_cm", None) is not None:
                self._prof_cm.__exit__(None, None, None)
                self._prof_cm = None
        if writer is not None:
            writer.close()
        if primary:
            print(f"training done in {time.time() - t_start:.1f}s")
        return self.state

    def _train_epochs(self, cfg, start_epoch, max_epoch, meter, primary,
                      writer, sync_every, print_freq, steps_per_epoch,
                      t_start, profiling, prof_start, prof_stop):
        self._prof_cm = None
        prefetch = cfg.TRAIN.prefetch_batches
        for epoch in range(start_epoch, max_epoch):
            t_epoch = time.time()
            device_batches = prefetch_sharded(
                self.batcher.epoch(epoch), self.mesh, depth=prefetch
            )
            for i, sb in enumerate(device_batches):
                self.state, metrics = self.train_step(
                    self.state, sb["img"], sb["label"]
                )
                if profiling and epoch == start_epoch:
                    if i == prof_start:
                        self._prof_cm = profiler_trace(cfg.TRAIN.profile_dir)
                        self._prof_cm.__enter__()
                    if i == prof_stop and self._prof_cm is not None:
                        jax.tree.map(
                            lambda a: a.block_until_ready()
                            if hasattr(a, "block_until_ready") else a,
                            metrics,
                        )
                        self._prof_cm.__exit__(None, None, None)
                        self._prof_cm = None
                n = i + 1
                if not (n % sync_every == 0 or n % print_freq == 0
                        or n == steps_per_epoch):
                    continue
                host = {k: float(v) for k, v in metrics.items()}
                if not np.isfinite(host["loss"]):
                    raise FloatingPointError(f"non-finite loss at epoch {epoch}: {host}")
                if n % print_freq == 0 and primary:
                    meter.update(host)
                    lr = float(self.lr_fn(int(self.state.step) - 1))
                    print(
                        f"epoch [{epoch + 1}/{max_epoch}] batch [{i + 1}/"
                        f"{self.batcher.steps_per_epoch()}] lr {lr:.2e} {meter}"
                    )
                    if writer is not None:
                        writer.write_scalars(host, int(self.state.step), prefix="train/")
                        writer.write_scalar("train/lr", lr, int(self.state.step))
            # reference save gate (Caption_distill_double.py:576-587): every
            # CHECKPOINT_FREQ epochs (freq<=0 disables the cadence) OR the
            # true last epoch — which saves even at freq<=0. Early-stopped
            # epochs past the last freq multiple are NOT saved, exactly like
            # the reference (train_2.sh copies epoch 80 for diffh/ema/zema
            # though they early-stop at 82/85, and epoch 10 for diff's stop
            # at 12 — those tails were never persisted there either).
            meet_freq = cfg.TRAIN.CHECKPOINT_FREQ > 0 and (
                (epoch + 1) % cfg.TRAIN.CHECKPOINT_FREQ == 0
            )
            if primary and (meet_freq or epoch + 1 == max_epoch):
                path = save_checkpoint(self.state, cfg.OUTPUT_DIR, self.model_name, epoch)
                print(f"checkpoint → {path} ({time.time() - t_epoch:.1f}s/epoch)")
            if 0 <= cfg.TRAIN.early_stop_epoch <= epoch + 1:
                if primary:
                    print(f"early stop at epoch {epoch + 1}")
                break


def build_trainer(cfg: Config, clip_params, clip_cfg, **kwargs):
    """Registry-driven construction (ref dassl/engine/build.py:6-13 reading
    cfg.TRAINER.NAME, set by the launchers' --trainer arg)."""
    name = cfg.TRAINER.NAME or "Caption_distill_double"
    return TRAINER_REGISTRY.get(name)(cfg, clip_params, clip_cfg, **kwargs)


@TRAINER_REGISTRY.register(name="Caption_distill_double_adapter")
class CaptionDistillAdapterTrainer(CaptionDistillTrainer):
    """Adapter trainer variant (ref: trainers/Caption_distill_double_adapter.py
    :463-627): prompts are encoded through a residual bottleneck text adapter;
    captions go through the plain tower; no evidence prompts / EMA / retrieval.

    The reference freezes its adapter at random init (only 'prompt_learner'
    params reach the optimizer); set TRAINER.adapter_trainable True to
    actually train it (strictly more capable, off by default for parity)."""

    def __init__(self, cfg: Config, clip_params, clip_cfg, dataset=None,
                 mesh=None, seed_key=None):
        super().__init__(cfg, clip_params, clip_cfg, dataset=dataset,
                         mesh=mesh, seed_key=seed_key)
        from ..models.adapter import init_adapter_params

        key = jax.random.PRNGKey(cfg.SEED + 1)
        adapter = init_adapter_params(
            key, clip_cfg.transformer_width, cfg.TRAINER.adapter_reduction
        )
        self.adapter = replicate(adapter, self.mesh)
        trainable = dict(self.trainable)
        if cfg.TRAINER.adapter_trainable:
            # independent copy: the state pytree is donated every step and
            # must not alias self.adapter's buffers
            trainable["_adapter"] = jax.tree.map(jnp.array, adapter)
        self.state = replicate(create_train_state(trainable, self.optimizer), self.mesh)
        self.train_step = make_train_step(
            self.clip_params, clip_cfg, self.constants, self.optimizer, self.flags,
            loss_name=cfg.TRAIN.LOSSFUNC, model_kind=cfg.TRAIN.MODEL,
            ema=cfg.TRAIN.ema, momentum=cfg.TRAIN.momentum,
            adapter=self.adapter, adapter_trainable=cfg.TRAINER.adapter_trainable,
            caption_q8=self._step_kwargs.get("caption_q8"),
            caption_fused=self._step_kwargs.get("caption_fused", False),
        )


def _trainer_probe_validate(self, batch_size: int = 256):
    """Score the held-out labeled caption probe (TRAIN.probe_holdout) with the
    CURRENT prompt params through the texts-as-images forward — the same
    branch training optimises — and return evaluator results with REAL mAP.
    This is the zero-egress substitute for a labeled image val split
    (VERDICT r1 item 9): mAP motion is visible every run."""
    from .evaluator import MLClassificationEvaluator

    if self.probe_tokens is None:
        print("validate probe: TRAIN.probe_holdout is 0 — no probe split")
        return {}
    params = jax.device_get(self.state.params)
    prompt_params = {k: v for k, v in params.items() if k != "_adapter"}
    adp = params.get("_adapter", getattr(self, "adapter", None))

    @jax.jit
    def score(clip_p, pp, captions):
        feats = encode_captions(clip_p, self.clip_cfg, captions, self.flags)
        return train_logits_from_features(
            clip_p, self.clip_cfg, pp, self.constants, feats, self.flags,
            adapter=adp,
        )

    evaluator = MLClassificationEvaluator(self.cfg.TRAINER.GL_merge_rate)
    n = len(self.probe_tokens)
    bs = min(batch_size, n)
    for i in range(0, n, bs):
        chunk = self.probe_tokens[i:i + bs]
        pad = bs - len(chunk)
        if pad:  # pad the tail to the compiled batch shape
            chunk = np.concatenate([chunk, np.zeros((pad,) + chunk.shape[1:], chunk.dtype)])
        out, out_local = score(self.clip_params, prompt_params, jnp.asarray(chunk))
        k = bs - pad
        evaluator.process(
            np.asarray(out[:k], np.float32), self.probe_labels[i:i + k],
            np.asarray(out_local[:k], np.float32) if out_local is not None else None,
        )
    res = evaluator.evaluate()
    print(f"validate probe ({n} held-out captions): {res}")
    return res


def _trainer_validate(self, max_images: int = 64, batch_size: int = 8):
    """Post-training validation pass (the reference's after_train final test /
    val smoke split, dassl trainer.py:415-436). With TRAIN.probe_holdout set,
    scores the held-out LABELED caption probe (real mAP signal); otherwise
    TTA-scores the val images (test[::100]) with the CURRENT prompt params.
    On the unlabeled competition split mAP is 0 by construction — that pass
    exercises the full inference path (pipeline smoke, SURVEY §4)."""
    if self.probe_tokens is not None:
        return self.validate_probe()
    from ..inference.tta import TTAEngine, build_model_spec
    from .evaluator import MLClassificationEvaluator
    from ..data.loader import ImageBatcher

    val_images = self.dataset.val_images[:max_images]
    if not val_images:
        print("validate: no val images available")
        return {}
    params = jax.device_get(self.state.params)
    prompt_params = {k: v for k, v in params.items() if k != "_adapter"}
    spec = build_model_spec(
        self.clip_params, self.clip_cfg, prompt_params, self.constants, self.flags
    )
    engine = TTAEngine(
        self.clip_params, self.clip_cfg, {self.model_name: spec},
        scales=self.cfg.TEST.multi_scale,
        crop_size=self.clip_cfg.image_resolution,
    )
    evaluator = MLClassificationEvaluator(self.cfg.TRAINER.GL_merge_rate)
    for images, _ in ImageBatcher(val_images, batch_size):
        results = engine.run_batch(images)
        out = results[self.model_name]
        labels = np.zeros_like(out["output_final"])
        evaluator.process(out["output_final"], labels, out["output_pos_final"])
    res = evaluator.evaluate()
    print(f"validate ({len(val_images)} images): {res}")
    return res


CaptionDistillTrainer.validate = _trainer_validate
CaptionDistillTrainer.validate_probe = _trainer_probe_validate
