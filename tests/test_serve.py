"""Serving layer: HTTP scoring service with request micro-batching over the
fused TTA engine (cli/serve.py). Runs a real ThreadingHTTPServer on an
ephemeral port and drives it with concurrent urllib clients."""

import base64
import io
import json
import threading
import urllib.request
from http.server import ThreadingHTTPServer

import numpy as np
import pytest

import jax

from leclip_tpu.cli.serve import ScoringService, make_handler
from leclip_tpu.inference.tta import TTAEngine, build_model_spec
from leclip_tpu.models.clip import CLIPConfig, init_clip_params
from leclip_tpu.models.dense_clip import DenseFlags
from leclip_tpu.models.prompt import build_prompt_learner

CLASSNAMES = ["dog", "cat", "person", "pizza"]

TINY = CLIPConfig(
    embed_dim=32, image_resolution=64, vision_layers=(1, 1, 1, 1),
    vision_width=8, vision_patch_size=None, transformer_width=64,
    transformer_heads=2, transformer_layers=2,
)


def _jpeg_bytes(rng, h=96, w=128) -> bytes:
    from PIL import Image

    arr = rng.integers(0, 255, (h, w, 3)).astype(np.uint8)
    buf = io.BytesIO()
    Image.fromarray(arr).save(buf, format="JPEG", quality=90)
    return buf.getvalue()


@pytest.fixture(scope="module")
def service():
    clip_params = init_clip_params(jax.random.PRNGKey(0), TINY)
    trainable, constants = build_prompt_learner(
        jax.random.PRNGKey(1), clip_params, CLASSNAMES, n_ctx=4
    )
    spec = build_model_spec(clip_params, TINY, trainable, constants, DenseFlags())
    engine = TTAEngine(clip_params, TINY, {"best": spec}, scales=(2,), crop_size=64)
    svc = ScoringService(engine, CLASSNAMES, batch_size=4, max_wait_ms=30.0)
    yield svc
    svc.close()


@pytest.fixture(scope="module")
def server(service):
    srv = ThreadingHTTPServer(
        ("127.0.0.1", 0),
        make_handler(service, topk=2, max_body_bytes=1 << 20, max_images=4,
                     max_pixels=1_000_000),
    )
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{srv.server_address[1]}"
    srv.shutdown()
    srv.server_close()


def test_healthz_and_classes(server):
    with urllib.request.urlopen(f"{server}/healthz", timeout=30) as r:
        health = json.loads(r.read())
    assert health["status"] == "ok"
    assert health["models"] == ["best"]
    assert health["crops_per_image"] >= 2
    with urllib.request.urlopen(f"{server}/classes", timeout=30) as r:
        assert json.loads(r.read())["classes"] == CLASSNAMES


def test_score_single_jpeg_matches_engine(server, service, rng):
    blob = _jpeg_bytes(rng)
    req = urllib.request.Request(
        f"{server}/score", data=blob, headers={"Content-Type": "image/jpeg"}
    )
    with urllib.request.urlopen(req, timeout=300) as r:
        out = json.loads(r.read())
    assert len(out["scores"]) == 1 and len(out["scores"][0]) == len(CLASSNAMES)
    assert len(out["topk"][0]) == 2
    assert out["topk"][0][0]["label"] in CLASSNAMES
    # parity with a direct engine call on the same decoded image
    from leclip_tpu.runtime.jpeg import decode_bytes_batch

    img = decode_bytes_batch([blob])[0]
    direct = np.asarray(service.score([img]), np.float32)
    np.testing.assert_allclose(np.asarray(out["scores"]), direct, rtol=1e-4, atol=1e-4)


def test_score_json_batch(server, rng):
    blobs = [_jpeg_bytes(rng) for _ in range(3)]
    payload = json.dumps(
        {"images": [base64.b64encode(b).decode() for b in blobs]}
    ).encode()
    req = urllib.request.Request(
        f"{server}/score", data=payload,
        headers={"Content-Type": "application/json"},
    )
    with urllib.request.urlopen(req, timeout=300) as r:
        out = json.loads(r.read())
    assert len(out["scores"]) == 3
    assert np.isfinite(np.asarray(out["scores"])).all()


def test_microbatching_groups_concurrent_requests(service, rng):
    """Concurrent single-image requests inside the wait window must be
    served in FEWER engine dispatches than requests (the point of serving
    through a batcher), with each caller getting its own row back."""
    imgs = [rng.integers(0, 255, (96, 128, 3)).astype(np.uint8) for _ in range(4)]
    # distinct images → distinct rows, so crosstalk would be visible
    singles = [np.asarray(service.score([im]), np.float32) for im in imgs]

    calls = []
    # the pipelined worker dispatches through dispatch_batch_fused —
    # instrument THAT (patching run_batch_fused would count nothing)
    real = service.engine.dispatch_batch_fused

    def counting(images):
        calls.append(len(images))
        return real(images)

    service.engine.dispatch_batch_fused = counting
    try:
        results = [None] * 4
        def worker(i):
            results[i] = np.asarray(service.score([imgs[i]]), np.float32)
        threads = [threading.Thread(target=worker, args=(i,)) for i in range(4)]
        for t in threads:
            t.start()
        for t in threads:
            t.join(timeout=300)
    finally:
        service.engine.dispatch_batch_fused = real
    assert calls, "instrumentation saw no dispatches"
    assert sum(calls) <= 2 * 4  # padded dispatches, not one per request
    assert len(calls) < 4, f"no micro-batching happened: {calls}"
    for i in range(4):
        np.testing.assert_allclose(results[i], singles[i], rtol=1e-5, atol=1e-5)


def test_unknown_path_404(server):
    with pytest.raises(urllib.error.HTTPError) as e:
        urllib.request.urlopen(f"{server}/nope", timeout=30)
    assert e.value.code == 404


def test_request_limit_guards(server, service, rng):
    """Body-size (413), image-count, empty-batch, and declared-dimension
    guards reject before any decode/dispatch happens."""
    import urllib.error

    def post(data, ctype):
        req = urllib.request.Request(
            f"{server}/score", data=data, headers={"Content-Type": ctype}
        )
        return urllib.request.urlopen(req, timeout=60)

    # oversize body -> 413
    with pytest.raises(urllib.error.HTTPError) as e:
        post(b"x" * (2 << 20), "image/jpeg")
    assert e.value.code == 413

    # empty JSON batch -> 400 (not a 500 from np.concatenate)
    with pytest.raises(urllib.error.HTTPError) as e:
        post(json.dumps({"images": []}).encode(), "application/json")
    assert e.value.code == 400

    # too many images -> 400
    blob = base64.b64encode(_jpeg_bytes(rng, 32, 32)).decode()
    with pytest.raises(urllib.error.HTTPError) as e:
        post(json.dumps({"images": [blob] * 5}).encode(), "application/json")
    assert e.value.code == 400

    # declared dimensions over the pixel cap -> 400 BEFORE decode. A solid
    # color compresses to a few KB, so only the dimension guard can fire
    # (a noise image this size would trip the body cap instead).
    from PIL import Image

    buf = io.BytesIO()
    Image.new("RGB", (2000, 2000), (40, 90, 200)).save(buf, format="JPEG")
    assert buf.tell() < 1 << 20
    with pytest.raises(urllib.error.HTTPError) as e:
        post(buf.getvalue(), "image/jpeg")
    assert e.value.code == 400

    # service-level: empty list is a clear ValueError
    with pytest.raises(ValueError):
        service.score([])


def test_close_fails_queued_requests():
    """close() must wake queued callers with an error immediately, not leave
    them sleeping out their timeout."""
    from leclip_tpu.cli.serve import ScoringService, _Request

    class NeverEngine:
        n_blocks = 1
        models = {"m": None}
        def dispatch_batch_fused(self, images):
            raise AssertionError("should not dispatch")

    svc = ScoringService(NeverEngine(), CLASSNAMES, batch_size=2, max_wait_ms=1.0)
    svc._stop.set()          # freeze the worker before it picks anything up
    svc._worker.join(timeout=10)
    req = _Request([np.zeros((8, 8, 3), np.uint8)])
    svc.queue.put(req)
    svc.close()
    assert req.event.is_set() and req.error == "service closed"


def test_swap_mid_microbatch_does_not_split_versions():
    """A swap_engine racing a multi-chunk micro-batch must not split that
    micro-batch across model versions: _dispatch_async snapshots the engine
    once, so every chunk of the in-flight request scores on the OLD engine
    and only the NEXT micro-batch sees the new one."""
    from leclip_tpu.cli.serve import ScoringService

    served = []

    class FakeEngine:
        n_blocks = 1
        models = {"m": None}

        def __init__(self, tag, on_dispatch=None):
            self.tag = tag
            self.on_dispatch = on_dispatch

        def dispatch_batch_fused(self, images):
            served.append(self.tag)
            if self.on_dispatch is not None:
                cb, self.on_dispatch = self.on_dispatch, None
                cb()
            return np.full((len(images), len(CLASSNAMES)),
                           float(self.tag == "new"), np.float32)

    svc = ScoringService(FakeEngine("old"), CLASSNAMES,
                         batch_size=2, max_wait_ms=1.0)
    new = FakeEngine("new")
    # the swap lands INSIDE the first chunk's dispatch — before the worker
    # reaches the second chunk of the same 4-image request
    svc.engine.on_dispatch = lambda: svc.swap_engine(new)
    try:
        img = np.zeros((8, 8, 3), np.uint8)
        first = np.asarray(svc.score([img] * 4), np.float32)
        assert served == ["old", "old"], served
        np.testing.assert_array_equal(first, 0.0)
        second = np.asarray(svc.score([img]), np.float32)
        assert served[-1] == "new"
        np.testing.assert_array_equal(second, 1.0)
    finally:
        svc.close()


def _parse_prometheus(text: str) -> dict:
    out = {}
    for line in text.splitlines():
        if not line or line.startswith("#"):
            continue
        name, value = line.rsplit(" ", 1)
        out[name] = float(value)
    return out


def test_metrics_endpoint(server, service, rng):
    """GET /metrics serves Prometheus text whose counters reflect actual
    traffic: one fresh scored image bumps requests/images/dispatches, padding
    accounts for the unfilled static batch, and the crop counter is
    dispatch_images x crops_per_image."""
    def fetch():
        with urllib.request.urlopen(f"{server}/metrics", timeout=30) as r:
            assert r.headers["Content-Type"].startswith("text/plain")
            return _parse_prometheus(r.read().decode())

    before = fetch()
    req = urllib.request.Request(
        f"{server}/score", data=_jpeg_bytes(rng),
        headers={"Content-Type": "image/jpeg"},
    )
    with urllib.request.urlopen(req, timeout=120) as r:
        assert r.status == 200
    after = fetch()

    assert after["leclip_requests_total"] == before["leclip_requests_total"] + 1
    assert after["leclip_images_total"] == before["leclip_images_total"] + 1
    d_disp = after["leclip_dispatches_total"] - before["leclip_dispatches_total"]
    d_real = (after["leclip_dispatch_images_total"]
              - before["leclip_dispatch_images_total"])
    d_pad = (after["leclip_dispatch_padding_total"]
             - before["leclip_dispatch_padding_total"])
    assert d_disp >= 1 and d_real >= 1
    # every dispatch is padded to the engine's static batch of 4
    assert d_real + d_pad == 4 * d_disp
    crops_per_image = 1 + service.engine.n_blocks
    assert after["leclip_crops_scored_total"] == (
        after["leclip_dispatch_images_total"] * crops_per_image
    )
    assert after["leclip_request_latency_seconds_count"] >= 1
    assert after['leclip_request_latency_seconds{quantile="0.5"}'] > 0
    assert after["leclip_uptime_seconds"] > 0


def test_reload_not_configured_is_501(server):
    req = urllib.request.Request(f"{server}/reload", data=b"")
    with pytest.raises(urllib.error.HTTPError) as e:
        urllib.request.urlopen(req, timeout=30)
    assert e.value.code == 501


def test_reload_endpoint_hot_swaps_engine(rng):
    """POST /reload swaps the engine without a restart: the model list
    changes, subsequent scores come from the NEW ensemble (direct-call
    parity), and the service keeps serving throughout."""
    import urllib.error

    clip_params = init_clip_params(jax.random.PRNGKey(0), TINY)

    def build_engine(seed, names):
        specs = {}
        for i, name in enumerate(names):
            tr, cs = build_prompt_learner(
                jax.random.PRNGKey(seed + i), clip_params, CLASSNAMES, n_ctx=4
            )
            specs[name] = build_model_spec(
                clip_params, TINY, tr, cs, DenseFlags()
            )
        return TTAEngine(clip_params, TINY, specs, scales=(2,), crop_size=64)

    svc = ScoringService(build_engine(1, ["best"]), CLASSNAMES,
                         batch_size=2, max_wait_ms=5.0)
    new_engine = build_engine(7, ["best", "ema"])
    srv = ThreadingHTTPServer(
        ("127.0.0.1", 0),
        make_handler(svc, topk=2, reload_fn=lambda: new_engine),
    )
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    base = f"http://127.0.0.1:{srv.server_address[1]}"
    try:
        blob = _jpeg_bytes(rng)

        def post(path, data, ctype):
            req = urllib.request.Request(
                f"{base}{path}", data=data, headers={"Content-Type": ctype}
            )
            with urllib.request.urlopen(req, timeout=300) as r:
                return json.loads(r.read())

        before = post("/score", blob, "image/jpeg")
        out = post("/reload", b"", "application/json")
        assert out == {"reloaded": True, "models": ["best", "ema"]}
        after = post("/score", blob, "image/jpeg")

        from leclip_tpu.runtime.jpeg import decode_bytes_batch

        img = decode_bytes_batch([blob])[0]
        direct = np.asarray(svc.score([img]), np.float32)  # new engine now
        np.testing.assert_allclose(
            np.asarray(after["scores"]), direct, rtol=1e-4, atol=1e-4
        )
        # a different ensemble really is serving
        assert not np.allclose(np.asarray(after["scores"]),
                               np.asarray(before["scores"]), atol=1e-3)
    finally:
        srv.shutdown()
        srv.server_close()
        svc.close()
