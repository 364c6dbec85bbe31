"""VGG19 perceptual + Gram-style loss
(BasicSR/basicsr/losses/losses.py:148-255)."""

import jax
import jax.numpy as jnp

from ..utils.registry import LOSS_REGISTRY
from ..nn.vgg import VGGFeatureExtractor


def gram_matrix(feat):
    """NHWC feature -> (B, C, C) gram / (c*h*w) (losses.py:244-255).
    fp32 accumulation regardless of the feature dtype."""
    n, h, w, c = feat.shape
    f = feat.reshape(n, h * w, c)
    g = jnp.einsum("nxc,nxd->ncd", f, f,
                   preferred_element_type=jnp.float32)
    return g / (c * h * w)


@LOSS_REGISTRY.register()
class PerceptualLoss:
    """Param-bearing loss: call .init(rng, shape) once, then
    __call__(vgg_params, x, gt) -> (percep, style)."""

    def __init__(self, layer_weights, vgg_type="vgg19", use_input_norm=True,
                 range_norm=False, perceptual_weight=1.0, style_weight=0.0,
                 criterion="l1", dtype="float32"):
        assert vgg_type == "vgg19", "only vgg19 is wired up (reference default)"
        self.layer_weights = dict(layer_weights)
        self.perceptual_weight = perceptual_weight
        self.style_weight = style_weight
        self.criterion = criterion
        # dtype: VGG compute dtype (TPU extension over the reference schema;
        # bfloat16 halves the dominant train-step cost, losses still reduce
        # in fp32 — see _crit)
        self.vgg = VGGFeatureExtractor(
            layer_name_list=tuple(self.layer_weights.keys()),
            use_input_norm=use_input_norm, range_norm=range_norm,
            dtype=jnp.dtype(dtype))

    def init(self, rng, image_shape=(1, 64, 64, 3)):
        return self.vgg.init(rng, jnp.zeros(image_shape))

    def _crit(self, a, b):
        d = a.astype(jnp.float32) - b.astype(jnp.float32)
        if self.criterion == "l1":
            return jnp.mean(jnp.abs(d))
        if self.criterion == "l2":
            return jnp.mean(jnp.square(d))
        if self.criterion == "fro":
            return jnp.linalg.norm(d.reshape(-1))
        raise NotImplementedError(self.criterion)

    def features(self, vgg_params, x):
        """One-branch extraction; lets the model hoist the no-grad gt branch
        out of its remat region (the gt forward has no cotangents, so
        recomputing it in the backward is pure waste)."""
        return self.vgg.apply(vgg_params, x)

    def compare(self, xf, gf):
        percep = None
        if self.perceptual_weight > 0:
            percep = sum(self._crit(xf[k], gf[k]) * w
                         for k, w in self.layer_weights.items())
            percep = percep * self.perceptual_weight
        style = None
        if self.style_weight and self.style_weight > 0:
            style = sum(self._crit(gram_matrix(xf[k]), gram_matrix(gf[k])) * w
                        for k, w in self.layer_weights.items())
            style = style * self.style_weight
        return percep, style

    def __call__(self, vgg_params, x, gt):
        xf = self.features(vgg_params, x)
        gf = self.features(vgg_params, jax.lax.stop_gradient(gt))
        return self.compare(xf, gf)
