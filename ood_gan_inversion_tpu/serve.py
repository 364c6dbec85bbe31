"""Micro-batching inference server around the InversionEngine.

The reference ships only offline CLIs (run_ood_faceGAN_inversion.py); for
production serving on TPU the throughput lever is batching concurrent
requests into one dispatch (PERF.md: the no-SAMM pipeline scales ~2x to
batch 8). This is a dependency-free asyncio HTTP server:

  * requests POST /invert with a raw float32 (H, W, 3) [0,1] image body
    (shape in headers) — or use the InProcessClient for tests;
  * a collector coalesces up to `max_batch` requests or waits `max_wait_ms`
    after the first arrival, pads the batch to the nearest compiled size
    (power of two — each distinct batch shape is one XLA program), and
    dispatches a single jitted forward;
  * responses carry the inverted image + the OOD mask.

Batch-padding note: XLA programs are shape-specialized, so serving every
possible batch size would compile O(max_batch) programs; rounding up to
powers of two keeps it at log2(max_batch) programs while wasting <2x
compute in the worst case (padded rows are dropped before reply).
"""

import asyncio
import json
import time

import numpy as np
import jax
import jax.numpy as jnp


def _round_pow2(n):
    p = 1
    while p < n:
        p *= 2
    return p


class BatchingServer:
    # serving replies carry the inverted image + OOD mask; requesting ONLY
    # those leaves from the jitted programs lets XLA DCE the latent/align
    # debug heads and, on remote-link backends, saves the per-dispatch
    # buffer handshake of the 7 unused output leaves (~40 ms/dispatch on
    # the axon tunnel — PERF.md r5 dispatch-overhead attribution)
    OUTPUTS = ("image", "mask")

    def __init__(self, engine, max_batch: int = 8, max_wait_ms: float = 5.0,
                 mesh=None, split_below: int = 0, fetch: str = "full",
                 staged_input=None, max_inflight: int = 1):
        """`mesh`: optional jax.sharding.Mesh — coalesced batches are then
        data-sharded across its devices (multi-chip serving), padded so the
        batch divides the mesh size.

        `split_below`: if > 1, coalesced groups SMALLER than this dispatch
        as per-image batch-1 calls instead of one padded pow2 batch.
        Motivation (PERF.md r4 batch curve on v5e): intermediate batches
        collapse — 31.5 ms/img at b=2/4 vs 22.5 at b=1 and 17.1 at b=8 —
        so n=2..6 requests are FASTER as n sequential b=1 dispatches
        (n×22.5 ms) than as one padded batch (63-137 ms). 7 is the
        break-even on the measured curve; default 0 keeps the plain pow2
        policy for hardware without the collapse."""
        self.engine = engine
        self.max_batch = max_batch
        self.max_wait_ms = max_wait_ms
        self.mesh = mesh
        self.split_below = split_below
        # fetch="probe": replies carry a 1x1 probe pixel instead of the full
        # image — a MEASUREMENT mode (tools/prof/prof_serve_hw.py loopback)
        # that exercises the real collector/batch/split logic at device
        # rates on hosts whose device link would otherwise dominate (the r4
        # axon tunnel moves ~12 MB/s; a full 1024px reply is ~6-16 MB). The
        # batch compute still runs in full on device; the probe fetch is
        # the completion barrier.
        self.fetch = fetch
        # staged_input: a single (H, W, 3) [0,1] image pre-staged ON DEVICE
        # at init; dispatches then build their batch by device-side concat
        # instead of uploading request bodies (request payloads are
        # ignored). MEASUREMENT mode, pairing with fetch="probe": with both
        # set, neither the request nor the reply crosses the host link, so
        # the collector/batch/split logic is observable at device rates
        # even over the ~12 MB/s axon tunnel (a 1024px fp32 request body
        # alone costs ~1 s there — PERF.md r5 loopback).
        self._staged = None
        if staged_input is not None:
            if mesh is not None:
                raise ValueError("staged_input is single-device only")
            from .utils.img_util import img2input
            self._staged = jax.device_put(
                jnp.asarray(img2input(staged_input, engine.out_size)),
                engine.device)
        # max_inflight: number of coalesced batches allowed in flight at
        # once. 1 = classic lockstep (form, dispatch, await, repeat). 2+
        # pipelines dispatches: batch k+1's compute is enqueued while batch
        # k's completion fetch is still in its host round-trip, hiding the
        # per-dispatch RTT (~29 ms on the axon tunnel) behind device work.
        # Device execution stays in-order; replies stay per-request-correct
        # (futures are resolved per batch). Requires warmup() first so
        # concurrent executor threads never race a compile.
        self.max_inflight = max(1, int(max_inflight))
        self._queue: asyncio.Queue = asyncio.Queue()
        self._stats = {"requests": 0, "batches": 0, "padded": 0, "split": 0}
        self._collector_task = None

    # ------------------------------------------------------------- dispatch
    def _batch_size_for(self, n):
        b = min(_round_pow2(n), self.max_batch)
        if self.mesh is not None:      # shardable: divide the mesh size
            m = self.mesh.devices.size
            b = max(-(-b // m) * m, m)
        return b

    def _fetch(self, out):
        """Device->host fetch of a dispatch's outputs (the serving link
        cost). fetch="probe" pulls a tiny packed probe per sample instead:
        ONE jitted packer gathers the corner pixel + mask value into a
        single (b, 4) array so the completion barrier costs one device
        round trip, not two eager slices + two fetches (~45 ms/dispatch on
        the axon link — PERF.md r5 dispatch-overhead attribution). One
        cached packer program per batch size, warmed by warmup()."""
        img, msk = out["image"], out["mask"]
        if self.fetch == "probe":
            if not hasattr(self, "_probe_pack"):
                def pack(img, msk):
                    p = img[:, 0, 0, :3].astype(jnp.float32)
                    if msk is not None:
                        p = jnp.concatenate(
                            [p, msk[:, 0, 0].reshape(-1, 1)
                                   .astype(jnp.float32)], -1)
                    return p
                self._probe_pack = jax.jit(pack)
            packed = np.asarray(self._probe_pack(img, msk))
            image = packed[:, :3].reshape(-1, 1, 1, 3)
            mask = (packed[:, 3].reshape(-1, 1, 1)
                    if packed.shape[1] > 3 else None)
            return image, mask
        image = np.asarray(img).astype(np.float32)
        mask = np.asarray(msk).astype(np.float32) if msk is not None else None
        return image, mask

    def _run_batch(self, imgs):
        n = len(imgs)
        if (self.mesh is None and 1 < n < self.split_below):
            # intermediate-batch collapse mitigation (see __init__), r5
            # form: ONE dispatch of n unrolled b=1 subgraphs (no pow2
            # padding — each exact n is one cached program). Per-request
            # results equal the batched path's to reduction-order ULPs
            # (per-sample noise keys + per-sample InstanceNorm make rows
            # batch-invariant; tests/test_serve.py split test).
            keys = np.stack([np.asarray(jax.random.PRNGKey(0))] * n, 0)
            if self._staged is not None:
                out = self.engine._dispatch_perkey_split(
                    jnp.concatenate([self._staged] * n, 0), keys,
                    self.OUTPUTS)
            else:
                out = self.engine.invert_batch_perkey_split(imgs, keys,
                                                            self.OUTPUTS)
            self._stats["split"] += n
            return self._fetch(out), n
        b = self._batch_size_for(n)
        imgs = list(imgs)
        if b > n:                      # pad to the compiled batch shape
            imgs.extend(imgs[-1:] * (b - n))
            self._stats["padded"] += b - n
        # One fixed key per sample: a request's noise (hence its reply) is
        # independent of its slot in the coalesced batch and of the padding.
        keys = np.stack([np.asarray(jax.random.PRNGKey(0))] * b, 0)
        if self.mesh is not None:
            out = self.engine.invert_batch_perkey_sharded(imgs, keys,
                                                          self.mesh)
        elif self._staged is not None:
            out = self.engine._dispatch_perkey(
                jnp.concatenate([self._staged] * b, 0), keys, self.OUTPUTS)
        else:
            out = self.engine.invert_batch_perkey(imgs, keys, self.OUTPUTS)
        return self._fetch(out), n

    def warmup(self):
        """Pre-compile every dispatchable batch shape with dummy inputs so
        live traffic never pays the (~25 s remote) XLA compile. With the
        split policy active each group size 2..split_below-1 is its own
        (exact-n, unpadded) split program; the rest are the pow2
        (mesh-rounded) batched programs."""
        size = self.engine.out_size
        dummy = np.zeros((size, size, 3), np.float32)
        sizes = sorted({self._batch_size_for(n)
                        for n in range(1, self.max_batch + 1)})
        if self.mesh is None and self.split_below > 2:
            sizes = sorted(set(sizes)
                           | set(range(2, min(self.split_below,
                                              self.max_batch + 1))))
        for b in sizes:
            self._run_batch([dummy] * b)
        return sizes

    async def _complete(self, dispatch, batch, sem):
        """Await one in-flight dispatch and resolve its batch's futures."""
        try:
            out, n = await dispatch
        except Exception as e:
            # a bad request (shape mismatch, OOM, ...) must not kill the
            # collector: fail this batch's futures and keep serving
            self._stats["errors"] = self._stats.get("errors", 0) + len(batch)
            for _, fut in batch:
                if not fut.done():
                    fut.set_exception(
                        RuntimeError(f"batch dispatch failed: {e!r}"))
            return
        finally:
            sem.release()
        self._stats["requests"] += n
        self._stats["batches"] += 1
        # _fetch pulled the arrays in the device dtype (bf16 serving
        # config halves the bytes through the host link — at r4's
        # measured ~12 MB/s fetch rate the transfer dominates reply
        # latency) and upcast on host
        image, mask = out
        for i, (_, fut) in enumerate(batch):
            if not fut.done():
                fut.set_result(
                    (image[i], mask[i] if mask is not None else None))

    async def _collector(self):
        loop = asyncio.get_running_loop()
        sem = asyncio.Semaphore(self.max_inflight)
        pending = set()
        stopping = False
        while not stopping:
            first = await self._queue.get()
            if first is None:
                break
            batch = [first]
            deadline = time.monotonic() + self.max_wait_ms / 1000.0
            while len(batch) < self.max_batch:
                timeout = deadline - time.monotonic()
                if timeout <= 0:
                    break
                try:
                    item = await asyncio.wait_for(self._queue.get(), timeout)
                except asyncio.TimeoutError:
                    break
                if item is None:
                    stopping = True   # drain this batch, then exit the loop
                    break
                batch.append(item)
            # bounded pipelining: hold at most max_inflight dispatches; the
            # next batch keeps coalescing while earlier ones run
            await sem.acquire()
            dispatch = loop.run_in_executor(
                None, self._run_batch, [b[0] for b in batch])
            task = asyncio.ensure_future(self._complete(dispatch, batch, sem))
            pending.add(task)
            task.add_done_callback(pending.discard)
        if pending:
            await asyncio.gather(*list(pending))

    async def start(self):
        # fresh queue per start: asyncio primitives bind to the loop that
        # first awaits them, so a server restarted under a new event loop
        # (tests, notebook re-runs) would otherwise hang its collector on
        # the dead loop's queue
        self._queue = asyncio.Queue()
        self._collector_task = asyncio.create_task(self._collector())

    async def stop(self):
        await self._queue.put(None)
        if self._collector_task is not None:
            await self._collector_task

    async def invert(self, img01: np.ndarray):
        """Submit one (H, W, 3) [0,1] image; returns (image, mask)."""
        fut = asyncio.get_running_loop().create_future()
        await self._queue.put((img01, fut))
        return await fut

    @property
    def stats(self):
        return dict(self._stats)

    # ------------------------------------------------------------------ http
    async def serve_http(self, host="127.0.0.1", port=8471):
        async def handle(reader, writer):
            try:
                line = await reader.readline()
                headers = {}
                while True:
                    h = (await reader.readline()).decode().strip()
                    if not h:
                        break
                    k, _, v = h.partition(":")
                    headers[k.strip().lower()] = v.strip()
                if line.split()[0] == b"GET":
                    body = json.dumps(self.stats).encode()
                else:
                    hs = headers["x-shape"].strip()
                    # JSON "[H, W, 3]" or bare "H,W,3"
                    shape = tuple(json.loads(hs) if hs.startswith("[")
                                  else (int(t) for t in hs.split(",")))
                    nbytes = int(headers["content-length"])
                    raw = await reader.readexactly(nbytes)
                    img = np.frombuffer(raw, np.float32).reshape(shape)
                    image, mask = await self.invert(img)
                    # reply dtype negotiation: `x-dtype: float16` halves the
                    # reply bytes (the dominant serving cost on narrow host
                    # links — PERF.md r4 measured ~12 MB/s; a 1024px fp32
                    # reply is ~16 MB). Values are rounded to fp16, which is
                    # below the pipeline's own bf16 noise floor.
                    rdt = headers.get("x-dtype", "float32")
                    if rdt == "float16":
                        image = image.astype(np.float16)
                        mask = mask.astype(np.float16) if mask is not None \
                            else None
                    else:
                        # only float16/float32 are supported: echoing an
                        # arbitrary requested dtype while the body stays
                        # float32 would make a conforming client misparse
                        # the payload (advisor r4)
                        rdt = "float32"
                    body = image.tobytes() + (mask.tobytes() if mask is not None else b"")
                    extra = (b"x-shape: " + json.dumps(list(image.shape)).encode()
                             + b"\r\nx-dtype: " + rdt.encode()
                             + b"\r\nx-mask-shape: "
                             + json.dumps(list(mask.shape) if mask is not None
                                          else None).encode() + b"\r\n")
                    writer.write(b"HTTP/1.1 200 OK\r\n" + extra
                                 + b"content-length: "
                                 + str(len(body)).encode() + b"\r\n\r\n" + body)
                    await writer.drain()
                    return
                writer.write(b"HTTP/1.1 200 OK\r\ncontent-length: "
                             + str(len(body)).encode() + b"\r\n\r\n" + body)
                await writer.drain()
            except Exception as e:  # pragma: no cover - transport errors
                try:
                    msg = str(e).encode()
                    writer.write(b"HTTP/1.1 500 ERR\r\ncontent-length: "
                                 + str(len(msg)).encode() + b"\r\n\r\n" + msg)
                    await writer.drain()
                except Exception:
                    pass
            finally:
                writer.close()

        await self.start()
        server = await asyncio.start_server(handle, host, port)
        async with server:
            await server.serve_forever()
