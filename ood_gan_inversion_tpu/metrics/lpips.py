"""LPIPS metric (reference src/metrics/lpips.py:10-76): uint8 HWC (BGR)
inputs, crop_border, [0,255] -> [-1,1], AlexNet-LPIPS distance. The net is a
lazy module-level singleton like the reference's global `lpips_model`."""

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
                    test_y_channel=False, model_path=None, **kwargs):
    """img/img2: uint8 HWC BGR (the tensor2img output convention)."""
    assert img.shape == img2.shape
    if crop_border != 0:
        img = img[crop_border:-crop_border, crop_border:-crop_border, ...]
        img2 = img2[crop_border:-crop_border, crop_border:-crop_border, ...]
    # BGR->RGB, [0,255] -> [-1,1], HWC -> NHWC
    def prep(a):
        a = a[..., ::-1].astype(np.float32) / 255.0
        a = a * 2.0 - 1.0
        return jnp.asarray(a[None])

    model = LPIPSModel.instance()
    return float(model(prep(img), prep(img2))[0])
