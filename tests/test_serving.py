"""Mixed-model batched serving tests (tiny fake pipelines)."""

import numpy as np
import jax.numpy as jnp
import pytest

from object_detectors_tpu.serve import BatchedDetectionServer, Request


def fake_pipeline(tag: float):
    def infer(images):
        b = images.shape[0]
        # encode the per-image mean into the score so responses are
        # attributable to their request
        score = jnp.mean(images.reshape(b, -1), axis=1)[:, None]
        boxes = jnp.tile(jnp.asarray([[1.0, 2.0, 3.0, 4.0]]), (b, 1))[
            :, None, :]
        labels = jnp.full((b, 1), int(tag), jnp.int32)
        valid = jnp.ones((b, 1), bool)
        return boxes, score, labels, valid

    return infer


def make_req(i, model, value):
    img = np.full((8, 8, 3), value, np.float32)
    return Request(i, model, img)


def test_mixed_stream_demultiplexes():
    server = BatchedDetectionServer(
        {"yolo": fake_pipeline(1), "retinanet": fake_pipeline(2)},
        batch_size=4)
    reqs = []
    for i in range(10):
        model = "yolo" if i % 2 == 0 else "retinanet"
        reqs.append(make_req(i, model, value=i / 10.0))
    out = server.run_stream(reqs)
    assert len(out) == 10
    by_id = {r.request_id: r for r in out}
    for i in range(10):
        r = by_id[i]
        assert r.model == ("yolo" if i % 2 == 0 else "retinanet")
        assert r.labels[0] == (1 if i % 2 == 0 else 2)
        # score must equal the request's own pixel value
        assert r.scores[0] == pytest.approx(i / 10.0, abs=1e-5)
        assert r.latency_s >= 0


def test_partial_batch_flush():
    server = BatchedDetectionServer({"m": fake_pipeline(0)}, batch_size=8)
    out = server.run_stream([make_req(0, "m", 0.5)])
    assert len(out) == 1
    assert out[0].scores[0] == pytest.approx(0.5, abs=1e-5)


def test_full_batches_dispatch_eagerly_resolve_on_drain():
    server = BatchedDetectionServer({"m": fake_pipeline(0)}, batch_size=2,
                                    max_delay_s=100.0)
    responses = []
    for i in range(4):
        server.submit(make_req(i, "m", i / 4))
        responses.extend(server.poll())
    # both batches were dispatched (queues empty) but results pipeline
    # in flight until drained
    assert all(len(q) == 0 for q in server.queues.values())
    assert len(server.pending) == 2
    responses.extend(server.drain())
    assert len(responses) == 4


def test_inflight_bound_forces_resolution():
    server = BatchedDetectionServer({"m": fake_pipeline(0)}, batch_size=1,
                                    max_delay_s=100.0)
    server.max_inflight = 2
    responses = []
    for i in range(6):
        server.submit(make_req(i, "m", 0.1))
        responses.extend(server.poll())
    # 6 dispatches with max 2 in flight -> at least 4 resolved already
    assert len(responses) >= 4
    responses.extend(server.drain())
    assert len(responses) == 6


def test_pooled_requests_single_dispatch_per_flush():
    """VERDICT r2 item 5: pooled ingest — requests carry slot indices
    into one device-resident pool tensor; a flush issues one fused
    gather+infer dispatch and responses unpack from one packed fetch."""
    calls = []

    def counting_pipeline(images):
        calls.append(images.shape)
        return fake_pipeline(7)(images)

    server = BatchedDetectionServer({"m": counting_pipeline},
                                    batch_size=4)
    pool = np.stack([np.full((8, 8, 3), v / 10.0, np.float32)
                     for v in range(6)])
    server.stage_pool(pool)
    reqs = [Request(i, "m", i % 6) for i in range(10)]
    out = server.run_stream(reqs)
    assert len(out) == 10
    by_id = {r.request_id: r for r in out}
    for i in range(10):
        r = by_id[i]
        assert r.labels[0] == 7
        assert r.scores[0] == pytest.approx((i % 6) / 10.0, abs=1e-5)
        np.testing.assert_allclose(r.boxes[0], [1.0, 2.0, 3.0, 4.0])
        assert bool(r.valid[0])
