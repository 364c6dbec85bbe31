"""ArcFace identity loss (reference src/losses/id_loss.py:15-106).

Crops the face region (35s:-33s, 32s:-36s, s=h//256), adaptive-avg-pools to
112x112, embeds with IR-SE-50, and penalizes 1 - cos(y_hat, y). MIMO mode
adds the cross-output reference term keyed by the per-view quality score.
"""

import jax
import jax.numpy as jnp

from ..utils.registry import LOSS_REGISTRY
from ..nn.irse import ArcFaceBackbone
from ..ops.resize import adaptive_avg_pool


@LOSS_REGISTRY.register()
class IDLoss:
    """Param-bearing: .init(rng) -> facenet params; __call__(params, ...)."""

    def __init__(self, loss_weight=1.0, ref_loss_weight=1.0, reduce="mean",
                 ckpt=None, **kwargs):
        self.loss_weight = loss_weight
        self.ref_loss_weight = ref_loss_weight
        self.reduce = reduce
        self.ckpt = ckpt  # consumed by the weight loader at model-build time
        self.facenet = ArcFaceBackbone(num_layers=50, mode="ir_se")

    def init(self, rng, image_size=112):
        return self.facenet.init(rng, jnp.zeros((1, image_size, image_size, 3)))

    def extract_feats(self, params, x):
        h = x.shape[1]
        ss = h // 256
        if ss >= 1:
            x = x[:, 35 * ss:-33 * ss, 32 * ss:-36 * ss, :]
        x = adaptive_avg_pool(x, (112, 112))
        return self.facenet.apply(params, x)

    def __call__(self, params, y_hat, y, x, mimo_id=False, score=None):
        """Shapes: non-mimo (B,H,W,C); mimo (B,K,H,W,C) with score (B,K).
        Returns (loss, ref_term)."""
        if not mimo_id:
            yh = self.extract_feats(params, y_hat)
            yf = jax.lax.stop_gradient(self.extract_feats(params, y))
            diff_target = 1.0 - jnp.sum(yh * yf, axis=-1)
            loss = self.loss_weight * jnp.mean(diff_target)
            return loss, jnp.zeros(())

        b, k = y_hat.shape[:2]
        flat = lambda t: t.reshape((-1,) + t.shape[2:])
        yh = self.extract_feats(params, flat(y_hat)).reshape(b, k, -1)
        yf = jax.lax.stop_gradient(
            self.extract_feats(params, flat(y))).reshape(b, k, -1)

        diff_target = 1.0 - jnp.sum(yh * yf, axis=-1)          # (B, K)
        idx_score = jnp.argmax(score, axis=-1)                  # (B,)
        idx_best = jnp.argmin(diff_target, axis=-1)             # (B,)

        # cross-output term: D[r,c] = 1 - <yh_r, sg(yh_c)>; diff = D - diag(D)
        d = 1.0 - jnp.einsum("bkf,blf->bkl", yh, jax.lax.stop_gradient(yh))
        diag = jnp.diagonal(d, axis1=1, axis2=2)                # (B, K)
        diff = d - diag[:, None, :]
        col_a = jnp.take_along_axis(diff, idx_score[:, None, None], axis=2)[..., 0]
        col_b = jnp.take_along_axis(diff, idx_best[:, None, None], axis=2)[..., 0]
        per_b = jnp.where(idx_score == idx_best,
                          jnp.mean(col_a, axis=1),
                          (jnp.mean(col_a, axis=1) + jnp.mean(col_b, axis=1)) / 2)
        ref = self.ref_loss_weight * jnp.mean(per_b)

        red = jnp.mean(diff_target) if self.reduce == "mean" else jnp.sum(diff_target)
        return self.loss_weight * red, ref


@LOSS_REGISTRY.register()
class ArcFaceLoss:
    """Reference src/losses/id_loss.py:108-135 (config-unused but
    inventoried): grayscale-resize both images to 128px, embed with
    ResNetArcFace (IRBlock [2,2,2,2]), L1 between embeddings. The reference
    method is literally named `foward` (a typo) and thus dead even when
    constructed; the working semantics are reproduced here."""

    def __init__(self, loss_weight=1.0, block="IRBlock", layers=(2, 2, 2, 2),
                 use_se=False, ckpt=None, **kwargs):
        from ..nn.arcface_resnet import ResNetArcFace
        assert block == "IRBlock", "reference only wires IRBlock"
        self.loss_weight = loss_weight
        self.ckpt = ckpt
        self.facenet = ResNetArcFace(layers=tuple(layers), use_se=use_se)

    def init(self, rng):
        return self.facenet.init(rng, jnp.zeros((1, 128, 128, 1)))

    def gray_resize_for_identity(self, x, size=128):
        from ..ops.resize import resize_bilinear
        gray = (0.2989 * x[..., 0] + 0.5870 * x[..., 1] + 0.1140 * x[..., 2])
        return resize_bilinear(gray[..., None], (size, size))

    def __call__(self, params, y_hat, y):
        e_hat = self.facenet.apply(params, self.gray_resize_for_identity(y_hat))
        e = jax.lax.stop_gradient(
            self.facenet.apply(params, self.gray_resize_for_identity(y)))
        return self.loss_weight * jnp.mean(jnp.abs(e_hat - e))
