"""Batch inversion engine (reference run_ood_faceGAN_inversion.py:29-191):
load model + weights, optional latent-direction editing, iterate image dirs,
save inversion + per-scale mask images, report PSNR/SSIM/LPIPS/ID and
per-image wall-clock (block_until_ready replaces cuda.synchronize)."""

import glob
import os
import os.path as osp
import time

import numpy as np
import jax
import jax.numpy as jnp

from .archs import build_network
from .parallel import (make_mesh, shard_batch, replicate_sharding,
                       batch_sharding, spatial_sharding)
from .utils.img_util import imread, img2input, tensor2img, imwrite
from .utils.logger import get_root_logger
from .metrics import calculate_metric


def load_editing_direction(path, name, intensity=1.0):
    """np.load(directions/<name>.npy) * intensity (reference L49-62)."""
    d = np.load(osp.join(path, f"{name}.npy")).astype(np.float32)
    return d * intensity


def list_images(folder):
    files = []
    for ext in ("*.png", "*.jpg", "*.jpeg"):
        files.extend(glob.glob(osp.join(folder, ext)))
    return sorted(files)


class InversionEngine:
    def __init__(self, opt, params=None, rng=None, seed: int = 0):
        self.opt = opt
        g_opt = {k: v for k, v in opt["network_g"].items()
                 if not (k.endswith("_pth") or k.endswith("_pth_key") or k in (
                     "stage", "progressiveModSize", "progressiveStart",
                     "progressiveStep", "progressiveStageSteps", "ModSize"))}
        self.net = build_network(g_opt)
        self.out_size = opt["network_g"].get("out_size", 1024)
        # the rng/seed pair must agree (rng == PRNGKey(seed)): the CPU path
        # consumes rng directly while the accelerator path inits in a
        # CPU-only subprocess that can only receive the int seed (advisor r4)
        if rng is None:
            rng = jax.random.PRNGKey(seed)
        elif not np.array_equal(np.asarray(rng),
                                np.asarray(jax.random.PRNGKey(seed))):
            raise ValueError(
                f"InversionEngine: seed={seed} does not reproduce the given "
                "rng; pass a matching (rng, seed) pair or just the seed")
        if params is None:
            x = jnp.zeros((1, self.out_size, self.out_size, 3))
            if jax.default_backend() == "cpu":
                # pure-CPU session (tests): in-process eager init is fast
                params = self.net.init({"params": rng, "noise": rng}, x,
                                       mod_size=256)["params"]
            else:
                # accelerator session: init in a CPU-only subprocess
                # (utils/host_init.py) — on-TPU init compiles for minutes,
                # and with the axon plugin initialized even on-CPU eager
                # compiles cost minutes (r4 environment note).
                from .utils.host_init import cpu_init_params
                params = cpu_init_params(
                    g_opt, (1, self.out_size, self.out_size, 3), seed=seed,
                    mod_size=256)
        # pin params to the accelerator once (CPU-resident params would be
        # re-transferred through the device tunnel on every call)
        accel = [d for d in jax.devices() if d.platform != "cpu"]
        self.device = accel[0] if accel else jax.devices()[0]
        self.params = jax.device_put(params, self.device)
        self.mod_size = opt["network_g"].get("ModSize") or 256
        self._fwd = jax.jit(lambda p, x, k: self.net.apply(
            {"params": p}, x, mod_size=self.mod_size, rngs={"noise": k}),
            device=self.device)

    def apply_direction(self, direction):
        """model.delta_latent += direction (reference L150-151)."""
        d = jnp.asarray(direction)
        if d.ndim == 2:
            d = d[None]
        self.params = dict(self.params)
        self.params["delta_latent"] = jax.device_put(
            self.params["delta_latent"] + d.astype(
                self.params["delta_latent"].dtype), self.device)

    def invert(self, img01, rng):
        x = jnp.asarray(img2input(img01, self.out_size))
        out = self._fwd(self.params, x, rng)
        jax.block_until_ready(out["image"])
        return out

    def invert_batch(self, imgs01, rng):
        """Batched single-device inversion (the serving fast path — each
        distinct batch size is one cached XLA program)."""
        x = np.stack([img2input(im, self.out_size)[0] for im in imgs01], 0)
        out = self._fwd(self.params, jnp.asarray(x), rng)
        jax.block_until_ready(out["image"])
        return out

    def invert_batch_perkey(self, imgs01, keys, outputs=None):
        """Batched inversion with one noise PRNGKey per sample (vmapped noise
        stream). A sample's output depends only on its own key — not on its
        slot in the coalesced batch or on the padded batch size — which makes
        serving replies reproducible. `outputs`: see _dispatch_perkey."""
        x = np.stack([img2input(im, self.out_size)[0] for im in imgs01], 0)
        out = self._dispatch_perkey(jnp.asarray(x), keys, outputs)
        jax.block_until_ready(out["image"])
        return out

    def _dispatch_perkey(self, x, keys, outputs=None):
        """Dispatch a preprocessed (possibly already device-resident) batch
        — the upload-free entry used by BatchingServer.

        `outputs`: optional tuple of result keys — the jitted program then
        returns ONLY those leaves. Serving uses ("image", "mask"): every
        extra output leaf costs a per-dispatch device-buffer handshake
        (~5-6 ms/leaf on the axon link — PERF.md r5 dispatch-overhead
        attribution: the full 9-leaf dict costs ~51 ms/dispatch before any
        fetch) and XLA dead-code-eliminates the unrequested heads.

        Does NOT block on completion: the caller's device->host fetch is
        the barrier (block_until_ready costs a full host round trip per
        dispatch on remote links — PERF.md r5 attribution). The public
        invert_batch_* wrappers keep the blocking contract."""
        if not hasattr(self, "_fwd_perkey"):
            self._fwd_perkey = {}
        if outputs not in self._fwd_perkey:
            one = lambda p, xi, k: self.net.apply(
                {"params": p}, xi[None], mod_size=self.mod_size,
                rngs={"noise": k})
            vm = jax.vmap(one, in_axes=(None, 0, 0))

            # squeeze the vmap singleton INSIDE the program: host-side
            # tree_map slicing dispatched one eager device op per output
            # leaf (~51 ms/call on the axon link)
            def f(p, xx, ks, _o=outputs):
                out = jax.tree_util.tree_map(lambda a: a[:, 0],
                                             vm(p, xx, ks))
                return out if _o is None else {k: out[k] for k in _o}
            self._fwd_perkey[outputs] = jax.jit(f, device=self.device)
        return self._fwd_perkey[outputs](self.params, x, jnp.asarray(keys))

    def invert_batch_perkey_split(self, imgs01, keys, outputs=None):
        """Per-sample-key inversion of n images as n UNROLLED b=1 subgraphs
        concatenated in ONE program (no vmap). Fixes the v5e intermediate-
        batch rate collapse: the vmapped b=2/4 programs run at 31.5-31.9
        ms/img while the same work as in-graph b=1 subgraphs runs at
        21.8-22.1 — XLA gives each subgraph its b=1 tilings and interleaves
        their schedules, in a single dispatch (PERF.md r5 b2-strategies;
        replaces the r4 host-side sequential-split mitigation which paid n
        dispatches). One cached XLA program per batch size; per-sample key
        determinism matches invert_batch_perkey to reassociation ULPs."""
        x = np.stack([img2input(im, self.out_size)[0] for im in imgs01], 0)
        out = self._dispatch_perkey_split(jnp.asarray(x), keys, outputs)
        jax.block_until_ready(out["image"])
        return out

    def _dispatch_perkey_split(self, x, keys, outputs=None):
        """Upload-free twin of `_dispatch_perkey` for the split programs
        (same `outputs` subsetting contract)."""
        n = x.shape[0]
        if not hasattr(self, "_fwd_split"):
            self._fwd_split = {}
        if (n, outputs) not in self._fwd_split:
            def f(p, xx, ks, _n=n, _o=outputs):
                outs = [self.net.apply({"params": p}, xx[i:i + 1],
                                       mod_size=self.mod_size,
                                       rngs={"noise": ks[i]})
                        for i in range(_n)]
                if _o is not None:
                    outs = [{k: o[k] for k in _o} for o in outs]
                return jax.tree_util.tree_map(
                    lambda *a: jnp.concatenate(a, 0), *outs)
            self._fwd_split[(n, outputs)] = jax.jit(f, device=self.device)
        return self._fwd_split[(n, outputs)](self.params, x,
                                             jnp.asarray(keys))

    def invert_batch_perkey_sharded(self, imgs01, keys, mesh):
        """Per-sample-key batched inversion data-sharded over a mesh (the
        multi-chip serving path: one coalesced dispatch spreads its samples
        across chips; replies keep the per-key determinism contract).
        len(imgs01) must divide the mesh's 'data' axis size."""
        x = np.stack([img2input(im, self.out_size)[0] for im in imgs01], 0)
        if getattr(self, "_pk_mesh", None) != mesh:
            self._pk_mesh = mesh
            one = lambda p, xi, k: self.net.apply(
                {"params": p}, xi[None], mod_size=self.mod_size,
                rngs={"noise": k})
            vm = jax.vmap(one, in_axes=(None, 0, 0))
            # in-graph singleton squeeze (see _dispatch_perkey)
            self._pk_sharded = jax.jit(
                lambda p, xx, ks: jax.tree_util.tree_map(
                    lambda a: a[:, 0], vm(p, xx, ks)),
                in_shardings=(replicate_sharding(mesh),
                              batch_sharding(mesh), batch_sharding(mesh)))
            self._pk_params_src = None
        if self._pk_params_src != id(self.params):
            # replicate once per params version (apply_direction swaps the
            # dict), not once per dispatch
            self._pk_params = jax.device_put(self.params,
                                             replicate_sharding(mesh))
            self._pk_params_src = id(self.params)
        sh = batch_sharding(mesh)
        out = self._pk_sharded(self._pk_params,
                               jax.device_put(jnp.asarray(x), sh),
                               jax.device_put(jnp.asarray(keys), sh))
        jax.block_until_ready(out["image"])
        return out

    def invert_spatial(self, img01, rng, mesh=None, min_h: int = 512):
        """Single-image latency scale-out: the >=min_h decode stages are
        H-sharded over an 'sp' mesh (parallel/spatial.py) so GSPMD splits
        the high-res tail convs across chips with ICI halo exchanges.
        Params and the coarse/SAMM stages stay replicated."""
        mesh = mesh or make_mesh([d for d in jax.devices()
                                  if d.platform != "cpu"] or jax.devices(),
                                 axes=("sp",))
        x = jnp.asarray(img2input(img01, self.out_size))
        params = jax.device_put(self.params, replicate_sharding(mesh))
        # Mesh implements __eq__/__hash__: the default-path fresh Mesh per
        # call still hits the cache (id() would retrace every call and could
        # alias a GC'd mesh's reused id).
        key = (mesh, min_h)
        if getattr(self, "_sp_key", None) != key:
            # fresh trace inside the SP context (constraints bake at trace)
            self._sp_key = key
            fwd = lambda p, x, k: self.net.apply(
                {"params": p}, x, mod_size=self.mod_size, rngs={"noise": k})
            with spatial_sharding(mesh, min_h=min_h):
                self._sp_fwd = jax.jit(fwd)
                out = self._sp_fwd(params, x, rng)
        else:
            out = self._sp_fwd(params, x, rng)
        jax.block_until_ready(out["image"])
        return out

    def invert_batch_sharded(self, imgs01, rng, mesh=None):
        """Data-parallel batched inversion over a device mesh: the batch is
        sharded over 'data', params replicated — the dataset-sweep scaling
        path (SURVEY.md §7 step 6). len(imgs01) must divide by mesh size."""
        mesh = mesh or make_mesh([d for d in jax.devices()
                                  if d.platform != "cpu"] or jax.devices())
        x = np.concatenate([img2input(im, self.out_size) for im in imgs01], 0)
        xs = shard_batch({"x": x}, mesh)["x"]
        params = jax.device_put(self.params, replicate_sharding(mesh))
        out = self._fwd(params, xs, rng)
        jax.block_until_ready(out["image"])
        return out


def run_inversion(opt, out_dir, params=None):
    logger = get_root_logger()
    engine = InversionEngine(opt, params=params)

    editing = opt.get("editing", {}) or {}
    if editing.get("direction"):
        d = load_editing_direction(editing.get("dir_path", "directions"),
                                   editing["direction"],
                                   editing.get("intensity", 1.0))
        engine.apply_direction(d)

    metrics_opt = (opt.get("val", {}) or {}).get("metrics", {})
    datasets = opt.get("datasets", {}) or {}
    rng = jax.random.PRNGKey(0)
    sums, count, times = {}, 0, []
    for name, ds_opt in datasets.items():
        folder = ds_opt.get("dataroot_gt")
        for path in list_images(folder):
            img = imread(path)
            t0 = time.time()
            out = engine.invert(img, rng)
            times.append(time.time() - t0)
            inv = tensor2img(np.asarray(out["image"]))
            base = osp.splitext(osp.basename(path))[0]
            imwrite(inv, osp.join(out_dir, "inversion", f"{base}.png"))
            for k, align in out["aligns"].items():
                m = (np.clip(np.asarray(align[0, ..., 2]), 0, 1) * 255
                     ).astype(np.uint8)
                imwrite(m, osp.join(out_dir, "masks", f"{base}_{k}.png"))
            gt = tensor2img(img2input(img, engine.out_size))
            for mname, m_opt in metrics_opt.items():
                val = calculate_metric({"img": inv, "img2": gt}, m_opt)
                sums[mname] = sums.get(mname, 0.0) + val
            count += 1
    report = {m: s / max(count, 1) for m, s in sums.items()}
    report["sec_per_img"] = float(np.mean(times[1:])) if len(times) > 1 else (
        times[0] if times else 0.0)
    report["images"] = count
    logger.info(f"Inversion report: {report}")
    return report
