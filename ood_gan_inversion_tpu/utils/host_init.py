"""Parameter init in a CPU-only subprocess, with an on-disk cache.

Why: when the axon TPU PJRT plugin is *initialized* in a process, every
local CPU compile becomes pathologically slow (measured this round: a
first `jax.random.fold_in` eager compile 172 s vs 0.16 s in a
JAX_PLATFORMS=cpu process; PERF.md r4 environment note). flax's
`Module.init` runs thousands of small eager ops, so in-process CPU init of
the big archs now hangs for hours. The fix: run the init in a fresh
subprocess pinned to JAX_PLATFORMS=cpu (where the plugin is registered but
never initialized), ship the numpy param tree back through a pickle, and
cache it keyed on (arch_opt, shape, seed) so repeated tool runs skip init
entirely.

Used by bench.py, tools/prof/*, and infer.py. The training pipeline builds
its own state via models/ood_model.py (jitted abstract init) and is not
affected.
"""

import hashlib
import json
import os
import pickle
import subprocess
import sys
import tempfile

_CACHE_DIR = os.environ.get("OGI_INIT_CACHE", "/tmp/ogi_init_cache")

_CODE_VERSION = None


def _code_version():
    """Hash of every .py source in the package: shape-preserving init/arch
    code changes must invalidate cached trees (advisor r4 — previously a
    stale tree survived any code change that kept shapes)."""
    global _CODE_VERSION
    if _CODE_VERSION is None:
        pkg = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        h = hashlib.sha1()
        for root, dirs, files in os.walk(pkg):
            dirs[:] = sorted(d for d in dirs if d != "__pycache__")
            for name in sorted(f for f in files if f.endswith(".py")):
                p = os.path.join(root, name)
                h.update(os.path.relpath(p, pkg).encode())
                with open(p, "rb") as f:
                    h.update(f.read())
        _CODE_VERSION = h.hexdigest()[:12]
    return _CODE_VERSION


def _cache_key(arch_opt, shape, seed, extra):
    """None (= do not cache) when the opt isn't plainly JSON-serializable:
    json default=str would stringify object reprs, whose embedded addresses
    change every process and defeat/alias cache entries (advisor r4)."""
    try:
        blob = json.dumps(
            [arch_opt, list(shape), seed, extra, _code_version()],
            sort_keys=True).encode()
    except TypeError:
        return None
    return hashlib.sha1(blob).hexdigest()[:20]


def cpu_init_params(arch_opt, shape=(1, 1024, 1024, 3), seed=0,
                    mod_size=256, cache=True):
    """Init a registered arch's params on CPU in a subprocess; returns the
    numpy param tree (device_put it wherever needed). Cached on disk."""
    os.makedirs(_CACHE_DIR, exist_ok=True)
    key = _cache_key(arch_opt, shape, seed, {"mod_size": mod_size})
    cache = cache and key is not None
    path = os.path.join(_CACHE_DIR, (key or "uncached") + ".pkl")
    if cache and os.path.exists(path):
        with open(path, "rb") as f:
            return pickle.load(f)
    spec = {"arch_opt": arch_opt, "shape": list(shape), "seed": seed,
            "mod_size": mod_size}
    with tempfile.NamedTemporaryFile("w", suffix=".json",
                                     delete=False) as f:
        json.dump(spec, f)
        spec_path = f.name
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    env.pop("JAX_PLATFORM_NAME", None)
    out_path = path + ".tmp.%d" % os.getpid()
    try:
        subprocess.run(
            [sys.executable, "-m", "ood_gan_inversion_tpu.utils.host_init",
             spec_path, out_path],
            env=env, check=True,
            cwd=os.path.dirname(os.path.dirname(os.path.dirname(
                os.path.abspath(__file__)))))
        with open(out_path, "rb") as f:
            tree = pickle.load(f)
        if cache:
            os.replace(out_path, path)
    finally:
        os.unlink(spec_path)
        if os.path.exists(out_path):
            os.unlink(out_path)
    return tree


def cpu_init_model_state(model_opt, sample_shape, seed=0, cache=True):
    """Init a full model TrainState (params + optimizer/EMA states) on CPU
    in a subprocess; returns the numpy-leaf TrainState pytree. Used by the
    train-path prof tools — in-process eager init_state hits the same
    pathological per-op compile costs as net.init."""
    os.makedirs(_CACHE_DIR, exist_ok=True)
    key = _cache_key(model_opt, sample_shape, seed, {"kind": "model_state"})
    cache = cache and key is not None
    path = os.path.join(_CACHE_DIR, (key or "uncached") + ".pkl")
    if cache and os.path.exists(path):
        with open(path, "rb") as f:
            return pickle.load(f)
    spec = {"model_opt": model_opt, "shape": list(sample_shape),
            "seed": seed, "kind": "model_state"}
    with tempfile.NamedTemporaryFile("w", suffix=".json",
                                     delete=False) as f:
        json.dump(spec, f)
        spec_path = f.name
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    env.pop("JAX_PLATFORM_NAME", None)
    out_path = path + ".tmp.%d" % os.getpid()
    try:
        subprocess.run(
            [sys.executable, "-m", "ood_gan_inversion_tpu.utils.host_init",
             spec_path, out_path],
            env=env, check=True,
            cwd=os.path.dirname(os.path.dirname(os.path.dirname(
                os.path.abspath(__file__)))))
        with open(out_path, "rb") as f:
            tree = pickle.load(f)
        if cache:
            os.replace(out_path, path)
    finally:
        os.unlink(spec_path)
        if os.path.exists(out_path):
            os.unlink(out_path)
    return tree


def _worker(spec_path, out_path):
    import numpy as np
    import jax
    import jax.numpy as jnp
    jax.config.update("jax_platforms", "cpu")

    with open(spec_path) as f:
        spec = json.load(f)
    if spec.get("kind") == "model_state":
        from ood_gan_inversion_tpu.models import build_model
        model = build_model(spec["model_opt"])
        state = model.init_state(jax.random.PRNGKey(spec["seed"]),
                                 tuple(spec["shape"]))
        tree = jax.tree_util.tree_map(np.asarray, state)
    else:
        from ood_gan_inversion_tpu.archs import build_network
        net = build_network(dict(spec["arch_opt"]))
        rng = jax.random.PRNGKey(spec["seed"])
        kwargs = {}
        if spec.get("mod_size") is not None:
            kwargs["mod_size"] = spec["mod_size"]
        variables = net.init({"params": rng, "noise": rng},
                             jnp.zeros(tuple(spec["shape"])), **kwargs)
        tree = jax.tree_util.tree_map(np.asarray, variables["params"])
    with open(out_path, "wb") as f:
        pickle.dump(tree, f, protocol=4)


if __name__ == "__main__":
    _worker(sys.argv[1], sys.argv[2])
