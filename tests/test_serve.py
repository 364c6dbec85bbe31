"""Micro-batching inference server (serve.py): coalescing, padding,
correctness vs the direct engine path, HTTP transport."""

import asyncio
import json

import numpy as np
import jax
import pytest

from ood_gan_inversion_tpu.infer import InversionEngine
from ood_gan_inversion_tpu.serve import BatchingServer, _round_pow2


OPT = {"network_g": {
    "type": "ood_faceGAN_e4e", "out_size": 64, "style_dim": 512,
    "n_mlp": 2, "channel_multiplier": 1, "enable_modulation": True,
    "modulation_type": "NOISE", "warp_scale": 0.08, "cycle_align": 1,
    "blend_with_gen": True, "ModSize": 32,
}}


@pytest.fixture(scope="module")
def engine():
    return InversionEngine(OPT)


def test_round_pow2():
    assert [_round_pow2(n) for n in (1, 2, 3, 4, 5, 8)] == [1, 2, 4, 4, 8, 8]


def test_concurrent_requests_are_batched(engine):
    srv = BatchingServer(engine, max_batch=4, max_wait_ms=50.0)
    rs = np.random.RandomState(0)
    imgs = [rs.rand(64, 64, 3).astype(np.float32) for _ in range(5)]

    async def run():
        await srv.start()
        outs = await asyncio.gather(*[srv.invert(im) for im in imgs])
        await srv.stop()
        return outs

    outs = asyncio.run(run())
    assert len(outs) == 5
    # batching actually coalesced: 5 requests in at most 3 dispatches
    assert srv.stats["requests"] == 5
    assert srv.stats["batches"] <= 3

    # response i must EXACTLY equal the direct per-key inversion of image i:
    # per-sample noise keys make the reply independent of the batch slot and
    # of the padded batch size the request happened to land in
    for im, (image, mask) in zip(imgs, outs):
        ref = engine.invert_batch_perkey(
            [im], np.asarray(jax.random.PRNGKey(0))[None])
        np.testing.assert_allclose(
            image, np.asarray(ref["image"][0]), atol=1e-5)
        assert mask is not None


def test_dispatch_error_does_not_kill_collector(engine):
    srv = BatchingServer(engine, max_batch=2, max_wait_ms=5.0)
    good = np.random.RandomState(2).rand(64, 64, 3).astype(np.float32)
    bad = np.zeros((64, 64, 1), np.float32)  # wrong channel count

    async def run():
        await srv.start()
        with pytest.raises(RuntimeError, match="batch dispatch failed"):
            await srv.invert(bad)
        # the collector must still be alive and serve the next request
        image, _ = await asyncio.wait_for(srv.invert(good), timeout=120)
        await asyncio.wait_for(srv.stop(), timeout=30)
        return image

    image = asyncio.run(run())
    assert np.isfinite(image).all()
    assert srv.stats["errors"] == 1


def test_stop_during_coalesce_window_terminates(engine):
    # the shutdown sentinel must not be swallowed by the batch-collection
    # inner loop: stop() while a request is being coalesced must return
    srv = BatchingServer(engine, max_batch=4, max_wait_ms=2000.0)
    img = np.random.RandomState(3).rand(64, 64, 3).astype(np.float32)

    async def run():
        await srv.start()
        req = asyncio.create_task(srv.invert(img))
        await asyncio.sleep(0.1)  # collector is now inside the wait window
        await asyncio.wait_for(srv.stop(), timeout=120)
        return await req

    image, _ = asyncio.run(run())
    assert np.isfinite(image).all()


def test_mesh_sharded_dispatch_matches_single_device(engine):
    """mesh= server: coalesced batches are data-sharded over the virtual
    8-device mesh; replies must be identical to single-device per-key
    dispatch (the determinism contract survives sharding)."""
    from ood_gan_inversion_tpu.parallel import make_mesh
    mesh = make_mesh(jax.devices())          # 8 virtual CPU devices
    srv = BatchingServer(engine, max_batch=8, max_wait_ms=50.0, mesh=mesh)
    assert srv._batch_size_for(1) == 8       # padded up to the mesh size
    rs = np.random.RandomState(7)
    imgs = [rs.rand(64, 64, 3).astype(np.float32) for _ in range(3)]

    async def run():
        await srv.start()
        outs = await asyncio.gather(*[srv.invert(im) for im in imgs])
        await srv.stop()
        return outs

    outs = asyncio.run(run())
    for im, (image, _) in zip(imgs, outs):
        ref = engine.invert_batch_perkey(
            [im], np.asarray(jax.random.PRNGKey(0))[None])
        np.testing.assert_allclose(
            image, np.asarray(ref["image"][0]), atol=1e-5)


def test_warmup_precompiles_every_batch_shape(engine):
    srv = BatchingServer(engine, max_batch=4, max_wait_ms=5.0)
    sizes = srv.warmup()
    assert sizes == [1, 2, 4]
    # every dispatchable shape is now in the jit cache: no new trace when a
    # real request arrives
    cached = engine._fwd_perkey[BatchingServer.OUTPUTS]._cache_size()
    img = np.random.RandomState(9).rand(64, 64, 3).astype(np.float32)

    async def run():
        await srv.start()
        out = await srv.invert(img)
        await srv.stop()
        return out

    image, _ = asyncio.run(run())
    assert np.isfinite(image).all()
    assert engine._fwd_perkey[BatchingServer.OUTPUTS]._cache_size() == cached


def test_http_transport(engine):
    srv = BatchingServer(engine, max_batch=2, max_wait_ms=5.0)

    async def run():
        task = asyncio.create_task(srv.serve_http(port=8473))
        await asyncio.sleep(0.3)
        img = np.random.RandomState(1).rand(64, 64, 3).astype(np.float32)
        reader, writer = await asyncio.open_connection("127.0.0.1", 8473)
        body = img.tobytes()
        writer.write(
            b"POST /invert HTTP/1.1\r\n"
            b"x-shape: " + json.dumps(list(img.shape)).encode() + b"\r\n"
            b"content-length: " + str(len(body)).encode() + b"\r\n\r\n"
            + body)
        await writer.drain()
        status = await reader.readline()
        assert b"200" in status
        rhdrs = {}
        while True:
            h = (await reader.readline()).decode().strip()
            if not h:
                break
            k, _, v = h.partition(":")
            rhdrs[k.strip().lower()] = v.strip()
        # response framing: x-shape / x-mask-shape headers say how to split
        # the image+mask body without out-of-band knowledge
        ishape = tuple(json.loads(rhdrs["x-shape"]))
        mshape = json.loads(rhdrs["x-mask-shape"])
        nb_img = int(np.prod(ishape)) * 4
        image = np.frombuffer(await reader.readexactly(nb_img),
                              np.float32).reshape(ishape)
        total = int(rhdrs["content-length"])
        if mshape is not None:
            mask = np.frombuffer(
                await reader.readexactly(total - nb_img),
                np.float32).reshape(tuple(mshape))
            assert np.isfinite(mask).all()
        writer.close()

        # stats endpoint
        r2, w2 = await asyncio.open_connection("127.0.0.1", 8473)
        w2.write(b"GET /stats HTTP/1.1\r\n\r\n")
        await w2.drain()
        assert b"200" in await r2.readline()
        hdrs = {}
        while True:
            h = (await r2.readline()).decode().strip()
            if not h:
                break
            k, _, v = h.partition(":")
            hdrs[k.strip().lower()] = v.strip()
        stats = json.loads(await r2.readexactly(int(hdrs["content-length"])))
        w2.close()

        # bare comma x-shape form ("64,64,3") is accepted too
        r3, w3 = await asyncio.open_connection("127.0.0.1", 8473)
        w3.write(
            b"POST /invert HTTP/1.1\r\n"
            b"x-shape: " + ",".join(map(str, img.shape)).encode() + b"\r\n"
            b"content-length: " + str(len(body)).encode() + b"\r\n\r\n"
            + body)
        await w3.drain()
        assert b"200" in await r3.readline()
        w3.close()

        # x-dtype: float16 reply negotiation (half the reply bytes; r4)
        r4, w4 = await asyncio.open_connection("127.0.0.1", 8473)
        w4.write(
            b"POST /invert HTTP/1.1\r\n"
            b"x-shape: " + json.dumps(list(img.shape)).encode() + b"\r\n"
            b"x-dtype: float16\r\n"
            b"content-length: " + str(len(body)).encode() + b"\r\n\r\n"
            + body)
        await w4.drain()
        assert b"200" in await r4.readline()
        h16 = {}
        while True:
            h = (await r4.readline()).decode().strip()
            if not h:
                break
            k, _, v = h.partition(":")
            h16[k.strip().lower()] = v.strip()
        assert h16["x-dtype"] == "float16"
        ishape16 = tuple(json.loads(h16["x-shape"]))
        img16 = np.frombuffer(
            await r4.readexactly(int(np.prod(ishape16)) * 2),
            np.float16).reshape(ishape16)
        # fp16 reply matches the fp32 reply to fp16 rounding
        np.testing.assert_allclose(img16.astype(np.float32), image,
                                   rtol=0, atol=2e-3)
        w4.close()
        task.cancel()
        return image, stats

    image, stats = asyncio.run(run())
    assert np.isfinite(image).all()
    assert stats["requests"] >= 1


def test_split_small_batches_matches_batched(engine):
    """split_below dispatches 2..n-1 coalesced requests as batch-1 calls
    (r4 intermediate-batch collapse mitigation); per-request replies must
    equal the padded-batch path's byte for byte."""
    srv_split = BatchingServer(engine, max_batch=4, max_wait_ms=30.0,
                               split_below=4)
    srv_plain = BatchingServer(engine, max_batch=4, max_wait_ms=30.0)
    imgs = [np.random.RandomState(i).rand(64, 64, 3).astype(np.float32)
            for i in range(2)]

    async def drive(srv):
        await srv.start()
        outs = await asyncio.gather(*[srv.invert(im) for im in imgs])
        await srv.stop()
        return outs

    outs_s = asyncio.run(drive(srv_split))
    outs_p = asyncio.run(drive(srv_plain))
    assert srv_split.stats["split"] == 2
    assert srv_plain.stats["split"] == 0
    for (si, sm), (pi, pm) in zip(outs_s, outs_p):
        # batch-1 and batch-2 programs differ at reduction-order ULP level
        # (e.g. InstanceNorm means); equality is numeric, not bitwise
        np.testing.assert_allclose(si, pi, rtol=0, atol=1e-4)
        if pm is not None:
            np.testing.assert_allclose(sm, pm, rtol=0, atol=1e-4)


def test_probe_fetch_mode(engine):
    """fetch="probe" (the loopback load-test mode) replies with 1x1 probes
    that equal the full reply's corner pixel, on both the batched and the
    split dispatch paths."""
    rs = np.random.RandomState(7)
    imgs = [rs.rand(64, 64, 3).astype(np.float32) for _ in range(3)]
    srv = BatchingServer(engine, max_batch=4, max_wait_ms=50.0,
                         fetch="probe", split_below=4)

    async def run():
        await srv.start()
        outs = await asyncio.gather(*[srv.invert(im) for im in imgs])
        await srv.stop()
        return outs

    outs = asyncio.run(run())
    assert srv.stats["split"] >= 2   # the split path ran at least once
    for im, (image, mask) in zip(imgs, outs):
        assert image.shape[:2] == (1, 1)
        ref = engine.invert_batch_perkey(
            [im], np.asarray(jax.random.PRNGKey(0))[None])
        np.testing.assert_allclose(
            image[0, 0], np.asarray(ref["image"][0, 0, 0]), atol=1e-5)


def test_staged_input_matches_upload_path(engine):
    """staged_input (device-pre-staged request image, the r5 loopback mode)
    must produce the same replies as uploading that image per request, on
    both the batched and the split dispatch paths."""
    img = np.random.RandomState(3).rand(64, 64, 3).astype(np.float32)
    srv = BatchingServer(engine, max_batch=4, max_wait_ms=50.0,
                         split_below=4, staged_input=img)

    async def run(n):
        await srv.start()
        outs = await asyncio.gather(*[srv.invert(img) for _ in range(n)])
        await srv.stop()
        return outs

    ref = engine.invert_batch_perkey(
        [img], np.asarray(jax.random.PRNGKey(0))[None])
    for n in (1, 2):                  # batched b=1 path, then split path
        for image, mask in asyncio.run(run(n)):
            np.testing.assert_allclose(
                image, np.asarray(ref["image"][0]), rtol=0, atol=1e-4)
            assert mask is not None
    assert srv.stats["split"] == 2


def test_pipelined_collector_matches_lockstep(engine):
    """max_inflight=2 overlaps dispatches; every reply must still match the
    direct engine result and the collector must drain cleanly on stop."""
    rs = np.random.RandomState(11)
    imgs = [rs.rand(64, 64, 3).astype(np.float32) for _ in range(4)]
    srv = BatchingServer(engine, max_batch=1, max_wait_ms=1.0,
                         max_inflight=2)

    async def run():
        await srv.start()
        outs = await asyncio.gather(*[srv.invert(im) for im in imgs])
        await srv.stop()
        return outs

    outs = asyncio.run(run())
    assert srv.stats["batches"] == 4 and srv.stats["requests"] == 4
    for im, (image, mask) in zip(imgs, outs):
        ref = engine.invert_batch_perkey(
            [im], np.asarray(jax.random.PRNGKey(0))[None])
        np.testing.assert_allclose(image, np.asarray(ref["image"][0]),
                                   rtol=0, atol=1e-5)
