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


def test_data_parallel_reg_family_matches_single():
    """The R1 + path-reg step family on a mesh (VERDICT r3 missing #5): the
    double-grad bodies (r1 penalty = grad-of-grad through D, path reg =
    decode vjp with a shrunk batch) interact with the data-axis psum —
    replaces the reference's DDP + reduce_loss_dict around
    BasicSR stylegan2_model.py:209-248. Sharded must equal single-device,
    and the reg losses must actually fire."""
    opt = _tiny_opt()
    opt["train"].update(net_d_reg_every=1, net_g_reg_every=1,
                        path_batch_shrink=2)
    model = build_model(opt)
    rng = jax.random.PRNGKey(0)
    state = model.init_state(rng, (4, 32, 32, 3))
    batch = make_batch(jax.random.PRNGKey(1), b=4, size=32)

    model2 = build_model(opt)
    new_ref, logs_ref = model2.train_step(state, batch,
                                          jax.random.PRNGKey(2), 0)
    assert "l_d_r1" in logs_ref and "l_g_path" in logs_ref

    state = model.init_state(rng, (4, 32, 32, 3))
    mesh = make_mesh(jax.devices()[:4])
    state_sh = jax.device_put(state, replicate_sharding(mesh))
    batch_sh = shard_batch(batch, mesh)
    new_sh, logs_sh = model.train_step(state_sh, batch_sh,
                                       jax.random.PRNGKey(2), 0)

    assert "l_d_r1" in logs_sh and "l_g_path" in logs_sh
    for key in ("l_total", "l_d_r1", "l_g_path", "l_d"):
        np.testing.assert_allclose(float(logs_sh[key]), float(logs_ref[key]),
                                   rtol=5e-4, atol=1e-5)
    a = np.asarray(jax.tree_util.tree_leaves(new_sh.params_g_train)[0])
    b = np.asarray(jax.tree_util.tree_leaves(new_ref.params_g_train)[0])
    np.testing.assert_allclose(a, b, rtol=2e-3, atol=1e-6)


def test_scaling_sanity_full_8_device_mesh():
    """One sample per device on the full virtual mesh: the batch must
    actually be split 8 ways (each device holds a (1, ...) shard) and the
    step must produce finite losses and replicated updated params."""
    model = build_model(_tiny_opt())
    state = model.init_state(jax.random.PRNGKey(0), (8, 32, 32, 3))
    mesh = make_mesh()
    state_sh = jax.device_put(state, replicate_sharding(mesh))
    batch = shard_batch(make_batch(jax.random.PRNGKey(1), b=8, size=32), mesh)

    shards = batch["gt"].addressable_shards
    assert len(shards) == 8
    assert all(s.data.shape[0] == 1 for s in shards)

    new_state, logs = model.train_step(state_sh, batch,
                                       jax.random.PRNGKey(2), 0)
    assert np.isfinite(float(logs["l_total"]))
    leaf = jax.tree_util.tree_leaves(new_state.params_g_train)[0]
    assert leaf.sharding.is_fully_replicated


def test_sharded_save_resume_roundtrip(tmp_path):
    """Checkpoint written from mesh-sharded arrays must restore into a
    sharded training run that continues bit-identically to an uninterrupted
    one (replaces the reference's rank-0 torch.save + map_location reload,
    BasicSR base_model.py:355-380)."""
    from ood_gan_inversion_tpu.utils.checkpoint import (
        save_training_checkpoint, resume_training_state)

    opt = _tiny_opt()
    model = build_model(opt)
    mesh = make_mesh(jax.devices()[:4])
    rep = replicate_sharding(mesh)

    state = jax.device_put(model.init_state(jax.random.PRNGKey(0),
                                            (4, 32, 32, 3)), rep)
    batch = shard_batch(make_batch(jax.random.PRNGKey(1), b=4, size=32), mesh)

    state1, _ = model.train_step(state, batch, jax.random.PRNGKey(2), 0)

    models_dir, states_dir = str(tmp_path / "models"), str(tmp_path / "states")
    assert save_training_checkpoint(state1, models_dir, states_dir, 1)

    # uninterrupted continuation (state1 is donated by the second step, so
    # checkpoint first, then continue)
    state2, logs2 = model.train_step(state1, batch, jax.random.PRNGKey(3), 1)

    # resumed continuation: fresh template, restore, re-shard, same step
    template = model.init_state(jax.random.PRNGKey(7), (4, 32, 32, 3))
    restored, it = resume_training_state(template, states_dir)
    assert it == 1
    restored = jax.device_put(restored, rep)
    state2r, logs2r = model.train_step(restored, batch,
                                       jax.random.PRNGKey(3), 1)

    np.testing.assert_allclose(float(logs2r["l_total"]),
                               float(logs2["l_total"]), rtol=1e-5, atol=1e-7)
    for a, b in zip(jax.tree_util.tree_leaves(state2r.params_g_train),
                    jax.tree_util.tree_leaves(state2.params_g_train)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-6, atol=1e-8)


def test_spatial_partitioned_decode_matches_single():
    """GSPMD spatial partitioning (parallel/spatial.py): the H-sharded
    high-res decode must produce the same image as the unsharded trace,
    with the constrained stages actually split over the 'sp' axis."""
    from ood_gan_inversion_tpu.archs import build_network
    from ood_gan_inversion_tpu.parallel import spatial_sharding

    net = build_network({
        "type": "ood_faceGAN_e4e", "out_size": 64, "style_dim": 512,
        "n_mlp": 2, "channel_multiplier": 1, "enable_modulation": True,
        "modulation_type": "NOISE", "warp_scale": 0.08, "cycle_align": 1,
        "blend_with_gen": True,
    })
    rng = jax.random.PRNGKey(0)
    x = jax.random.normal(jax.random.PRNGKey(1), (1, 64, 64, 3)) * 0.3
    params = net.init({"params": rng, "noise": rng}, x, mod_size=32)["params"]

    def fwd(p, x, k):
        out = net.apply({"params": p}, x, mod_size=32, rngs={"noise": k})
        return out["image"]

    ref = jax.jit(fwd)(params, x, jax.random.PRNGKey(2))

    mesh = make_mesh(jax.devices()[:4], axes=("sp",))
    params_r = jax.device_put(params, replicate_sharding(mesh))
    with spatial_sharding(mesh, min_h=32):
        sp_fwd = jax.jit(fwd)
        out = sp_fwd(params_r, jax.device_put(x, replicate_sharding(mesh)),
                     jax.random.PRNGKey(2))
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-4, atol=2e-4)


def test_hybrid_dp_sp_train_step_matches_single():
    """Hybrid 2-D mesh training: batch sharded over 'data', the decode's
    high-res stages H-sharded over 'sp' (parallel/spatial.py constraints
    inside the jitted train step). Same data + rngs must reproduce the
    single-device update — beyond the reference's pure-DDP capability."""
    from ood_gan_inversion_tpu.parallel import spatial_sharding

    model = build_model(_tiny_opt())
    rng = jax.random.PRNGKey(0)
    state = model.init_state(rng, (4, 32, 32, 3))
    batch = make_batch(jax.random.PRNGKey(1), b=4, size=32)

    model2 = build_model(_tiny_opt())
    new_ref, logs_ref = model2.train_step(state, batch,
                                          jax.random.PRNGKey(2), 0)

    state = model.init_state(rng, (4, 32, 32, 3))
    mesh = make_mesh(jax.devices()[:4], axes=("data", "sp"), shape=(2, 2))
    rep = replicate_sharding(mesh)
    state_sh = jax.device_put(state, rep)
    batch_sh = shard_batch(batch, mesh)

    with spatial_sharding(mesh, min_h=16):
        new_sh, logs_sh = model.train_step(state_sh, batch_sh,
                                           jax.random.PRNGKey(2), 0)

    np.testing.assert_allclose(float(logs_sh["l_total"]),
                               float(logs_ref["l_total"]), rtol=2e-4,
                               atol=1e-5)
    a = np.asarray(jax.tree_util.tree_leaves(new_sh.params_g_train)[0])
    b = np.asarray(jax.tree_util.tree_leaves(new_ref.params_g_train)[0])
    np.testing.assert_allclose(a, b, rtol=2e-3, atol=1e-6)


def test_spatial_partitioning_through_packed_stages():
    """The >=512px stages use the polyphase-packed path (ops/polyphase.py
    space-to-depth reshapes); GSPMD must still split them under the 'sp'
    constraint and reproduce the single-device decode."""
    from ood_gan_inversion_tpu.nn.stylegan2 import Generator
    from ood_gan_inversion_tpu.parallel import spatial_sharding

    gen = Generator(size=512, style_dim=512, n_mlp=2, channel_multiplier=1,
                    narrow=0.5)
    rng = jax.random.PRNGKey(0)
    lat = jax.random.normal(jax.random.PRNGKey(1), (1, 16, 512)) * 0.3
    noise = [jnp.zeros((1, 2 ** ((i + 5) // 2), 2 ** ((i + 5) // 2), 1))
             for i in range(15)]
    params = gen.init({"params": rng}, lat, noise=noise)["params"]

    fwd = lambda p, l: gen.apply({"params": p}, l, noise=noise)
    ref = jax.jit(fwd)(params, lat)

    mesh = make_mesh(jax.devices()[:4], axes=("sp",))
    rep = replicate_sharding(mesh)
    with spatial_sharding(mesh, min_h=128):
        out = jax.jit(fwd)(jax.device_put(params, rep),
                           jax.device_put(lat, rep))
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-4, atol=2e-4)
