"""Data-parallel training over the virtual 8-device CPU mesh — the
multi-node-without-a-cluster capability the reference never had
(SURVEY.md §4)."""

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from ood_gan_inversion_tpu.parallel import make_mesh, shard_batch, replicate_sharding
from tests.test_train_model import micro_opt, make_batch
from ood_gan_inversion_tpu.models import build_model


def test_mesh_shapes():
    mesh = make_mesh()
    assert mesh.devices.size == 8


def _tiny_opt():
    opt = micro_opt()
    opt["network_g"].update(out_size=32, cycle_align=1,
                            progressiveModSize=[32])
    opt["network_d"]["out_size"] = 32
    opt["network_d2"]["chn"] = 8
    opt["train"]["mask_opt"]["loss_func"] = {
        "binary": [32], "area": {"32": 0.3}, "target": 1,
        "binary_weight": 4e-2}
    return opt


def test_data_parallel_train_step_matches_single():
    """A sharded step must produce the same params as the unsharded one
    (same data, same rngs) — XLA's psum is the only collective involved."""
    model = build_model(_tiny_opt())
    rng = jax.random.PRNGKey(0)
    state = model.init_state(rng, (4, 32, 32, 3))
    batch = make_batch(jax.random.PRNGKey(1), b=4, size=32)

    # single-device reference FIRST: the train step donates its input state,
    # and a replicated device_put may alias the shard-0 buffer on CPU
    model2 = build_model(_tiny_opt())
    new_ref, logs_ref = model2.train_step(state, batch, jax.random.PRNGKey(2), 0)

    # rebuild the same initial state for the sharded run
    state = model.init_state(rng, (4, 32, 32, 3))
    mesh = make_mesh(jax.devices()[:4])
    rep = replicate_sharding(mesh)
    state_sh = jax.device_put(state, rep)
    batch_sh = shard_batch(batch, mesh)

    new_sh, logs_sh = model.train_step(state_sh, batch_sh, jax.random.PRNGKey(2), 0)

    np.testing.assert_allclose(float(logs_sh["l_total"]),
                               float(logs_ref["l_total"]), rtol=2e-4, atol=1e-5)
    a = np.asarray(jax.tree_util.tree_leaves(new_sh.params_g_train)[0])
    b = np.asarray(jax.tree_util.tree_leaves(new_ref.params_g_train)[0])
    np.testing.assert_allclose(a, b, rtol=2e-3, atol=1e-6)
