"""ID-similarity metric (reference src/metrics/identity.py:9-53):
1 - (1 - cos) = cosine similarity of ArcFace embeddings, computed on uint8
HWC (BGR) images. Lazy global backbone like the reference.

Three reference protocol quirks are MIRRORED (not fixed) so scores are
comparable with its published protocol:
  * crop_border / test_y_channel are ACCEPTED BUT IGNORED — the reference
    signature swallows them in **kwargs and never applies them
    (src/metrics/identity.py:9, 26-40);
  * np2tensor maps [0,255] -> x*2/255 - 0.5 in [-0.5, 1.5]
    (identity.py:35), not the canonical [-1, 1];
  * the tensor2img output fed in is BGR and is never flipped to RGB."""

import numpy as np
import jax
import jax.numpy as jnp

from ..utils.registry import METRIC_REGISTRY
from ..losses.id_loss import IDLoss


def _load_irse50_pth(model_path):
    """Convert a torch model_ir_se50.pth state_dict to flax params at metric
    time — the reference's IDLoss(ckpt=net) drop-in contract
    (src/metrics/identity.py:43). Lazy torch import; the converter lives in
    tools/ (one-time-offline for model weights, on-demand here)."""
    import importlib.util
    import os.path as osp
    import torch
    from flax import traverse_util
    tool = osp.join(osp.dirname(__file__), "..", "..", "tools",
                    "convert_torch_weights.py")
    spec = importlib.util.spec_from_file_location("_ogi_convert", tool)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    sd = torch.load(model_path, map_location="cpu", weights_only=True)
    flat, leftovers = mod.convert_irse50_backbone(sd)
    assert not leftovers, f"unconverted ir_se50 keys: {sorted(leftovers)[:5]}"
    params = traverse_util.unflatten_dict(
        {tuple(k.split("/")): v for k, v in flat.items()})
    return {"params": params}


class _IDModel:
    _instance = None
    _instance_path = None

    def __init__(self, params=None):
        self.idl = IDLoss(loss_weight=1.0, ref_loss_weight=0.0)
        if params is None:
            params = self.idl.init(jax.random.PRNGKey(0))
        self.params = params
        self._fn = jax.jit(
            lambda a, b: self.idl(self.params, a, b, a, mimo_id=False)[0])

    @classmethod
    def instance(cls, params=None, model_path=None):
        if model_path is not None and cls._instance_path != model_path:
            import os.path as osp
            if osp.exists(model_path):
                cls._instance = cls(_load_irse50_pth(model_path))
                cls._instance_path = model_path
        if cls._instance is None or params is not None:
            cls._instance = cls(params)
        return cls._instance


@METRIC_REGISTRY.register()
def calculate_identity(img, img2, crop_border=0, input_order="HWC",
                       test_y_channel=False, model_path=None, **kwargs):
    # crop_border / test_y_channel intentionally unused — the reference
    # swallows them (see module docstring); kept in the signature so configs
    # mirroring the reference YAML dispatch cleanly
    assert img.shape == img2.shape

    def prep(a):
        # reference np2tensor: x*2/255 - 0.5, channels (BGR) as-is
        a = a.astype(np.float32) * (2.0 / 255.0) - 0.5
        return jnp.asarray(a[None])

    m = _IDModel.instance(model_path=model_path)
    loss = float(m._fn(prep(img), prep(img2)))
    return 1.0 - loss
