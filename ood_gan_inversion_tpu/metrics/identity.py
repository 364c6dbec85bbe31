"""ID-similarity metric (reference src/metrics/identity.py:9-53):
1 - (1 - cos) = cosine similarity of ArcFace embeddings, computed on uint8
HWC (BGR) images. Lazy global backbone like the reference."""

import numpy as np
import jax
import jax.numpy as jnp

from ..utils.registry import METRIC_REGISTRY
from ..losses.id_loss import IDLoss


class _IDModel:
    _instance = None

    def __init__(self, params=None):
        self.idl = IDLoss(loss_weight=1.0, ref_loss_weight=0.0)
        if params is None:
            params = self.idl.init(jax.random.PRNGKey(0))
        self.params = params
        self._fn = jax.jit(
            lambda a, b: self.idl(self.params, a, b, a, mimo_id=False)[0])

    @classmethod
    def instance(cls, params=None):
        if cls._instance is None or params is not None:
            cls._instance = cls(params)
        return cls._instance


@METRIC_REGISTRY.register()
def calculate_identity(img, img2, crop_border=0, input_order="HWC",
                       test_y_channel=False, model_path=None, **kwargs):
    assert img.shape == img2.shape
    if crop_border != 0:
        img = img[crop_border:-crop_border, crop_border:-crop_border, ...]
        img2 = img2[crop_border:-crop_border, crop_border:-crop_border, ...]

    def prep(a):
        a = a[..., ::-1].astype(np.float32) / 255.0
        return jnp.asarray((a * 2.0 - 1.0)[None])

    m = _IDModel.instance()
    loss = float(m._fn(prep(img), prep(img2)))
    return 1.0 - loss
