"""Checkpoint / resume (orbax pytrees).

Reference policy (base_model.py:196-353 + OOD_faceGAN_model.py:943-1039):
  * weights saved per-net under 'params' / 'params_ema' keys;
  * net_g saves ONLY the keyword-filtered trainable subset
    (modulation + feats_conv [+ delta_latent]) because encoder+generator are
    frozen pretrained weights — here the trainable subtree IS that subset,
    so the policy falls out of the state layout;
  * a '.state' file round-trips optimizers/schedulers/epoch/iter;
  * auto_resume scans training_states/ and picks the max iter.

Here both families are orbax checkpoints: net_<iter> (train + ema subtrees
per net) and state_<iter> (the full TrainState, which embeds the step and
optimizer states — schedulers are pure functions of step and need no state).
Retry-on-failure (3x, 1s) mirrors base_model.py:225-240.
"""

import os
import os.path as osp
import re
import time

import jax
import numpy as np
import orbax.checkpoint as ocp

from .logger import get_root_logger


def _checkpointer():
    return ocp.PyTreeCheckpointer()


def _to_numpy(tree):
    return jax.tree_util.tree_map(lambda x: np.asarray(x), tree)


def save_pytree(tree, path, retry=3):
    logger = get_root_logger()
    path = osp.abspath(path)
    while retry > 0:
        try:
            _checkpointer().save(path, _to_numpy(tree), force=True)
            return True
        except Exception as e:
            logger.warning(f"Save ckpt error: {e}, remaining retries: {retry - 1}")
            time.sleep(1)
            retry -= 1
    logger.warning(f"Still cannot save {path}.")
    return False


def load_pytree(path, target=None):
    restore_args = None
    if target is not None:
        restore_args = ocp.checkpoint_utils.construct_restore_args(
            _to_numpy(target))
        return _checkpointer().restore(
            osp.abspath(path), item=_to_numpy(target),
            restore_args=restore_args)
    return _checkpointer().restore(osp.abspath(path))


def save_training_checkpoint(state, models_dir, states_dir, it):
    """Weights (trainable + EMA subtrees per net) and the full train state.
    When delta_latent is being optimized it is additionally saved standalone
    (reference save_param, OOD_faceGAN_model.py:943-965, 978-979)."""
    weights = {
        "params": state.params_g_train,
        "params_ema": state.ema_train,
        "params_d": state.params_d,
        "params_d2": state.params_d2,
    }
    ok = save_pytree(weights, osp.join(models_dir, f"net_{it}"))
    if isinstance(state.params_g_train, dict) and             "delta_latent" in state.params_g_train:
        ok = save_pytree({"delta_latent": state.params_g_train["delta_latent"]},
                         osp.join(models_dir, f"delta_lat_{it}")) and ok
    ok = save_pytree(state, osp.join(states_dir, f"state_{it}")) and ok
    return ok


def find_resume_state(states_dir):
    """auto_resume scan (train.py:68-88): pick max-iter state dir."""
    if not osp.isdir(states_dir):
        return None, 0
    found = []
    for name in os.listdir(states_dir):
        m = re.fullmatch(r"state_(\d+)", name)
        if m:
            found.append(int(m.group(1)))
    if not found:
        return None, 0
    it = max(found)
    return osp.join(states_dir, f"state_{it}"), it


def resume_training_state(state_template, states_dir):
    path, it = find_resume_state(states_dir)
    if path is None:
        return None, 0
    restored = load_pytree(path, target=state_template)
    return restored, it
