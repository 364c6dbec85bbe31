"""LPIPS metric (reference src/metrics/lpips.py:10-76): uint8 HWC (BGR)
inputs, crop_border, AlexNet-LPIPS distance. The net is a lazy module-level
singleton like the reference's global `loss_fn_alex`.

Two reference protocol quirks are MIRRORED (not fixed) so scores are
comparable with its published protocol:
  * np2tensor maps [0,255] -> x*2/255 - 0.5 in [-0.5, 1.5]
    (src/metrics/lpips.py:63), not the canonical [-1, 1];
  * the tensor2img output fed in is BGR, and the reference never flips it
    to the RGB order the LPIPS shift/scale constants were fit for.
"""

import numpy as np
import jax
import jax.numpy as jnp

from ..utils.registry import METRIC_REGISTRY
from ..nn.lpips import LPIPS


class LPIPSModel:
    """Lazy singleton holding params + a jitted distance fn."""
    _instance = None

    def __init__(self, params=None, image_size=256):
        self.net = LPIPS()
        if params is None:
            params = self.net.init(jax.random.PRNGKey(0),
                                   jnp.zeros((1, image_size, image_size, 3)),
                                   jnp.zeros((1, image_size, image_size, 3)))
        self.params = params
        self._fn = jax.jit(lambda a, b: self.net.apply(self.params, a, b))

    @classmethod
    def instance(cls, params=None):
        if cls._instance is None or params is not None:
            cls._instance = cls(params)
        return cls._instance

    def __call__(self, a, b):
        return np.asarray(self._fn(a, b))


@METRIC_REGISTRY.register()
def calculate_lpips(img, img2, crop_border, input_order="HWC",
                    test_y_channel=False, strict_shape=True,
                    model_path=None, **kwargs):
    """img/img2: uint8 HWC BGR (the tensor2img output convention)."""
    if strict_shape:
        assert img.shape == img2.shape, (img.shape, img2.shape)
    else:
        # reference strict_shape=False: crop both to the common extent
        # (src/metrics/lpips.py:34-40)
        h = min(img.shape[0], img2.shape[0])
        w = min(img.shape[1], img2.shape[1])
        c = min(img.shape[2], img2.shape[2])
        img, img2 = img[:h, :w, :c], img2[:h, :w, :c]
    if crop_border != 0:
        img = img[crop_border:-crop_border, crop_border:-crop_border, ...]
        img2 = img2[crop_border:-crop_border, crop_border:-crop_border, ...]

    def prep(a):
        # reference np2tensor: x*2/255 - 0.5 (NOT [-1,1]), channels as-is
        a = a.astype(np.float32) * (2.0 / 255.0) - 0.5
        return jnp.asarray(a[None])

    model = LPIPSModel.instance()
    return float(model(prep(img), prep(img2))[0])
