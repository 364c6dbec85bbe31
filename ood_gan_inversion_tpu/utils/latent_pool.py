"""Host-side latent-codes replay pool.

Reference: src/ops/e4e/latent_codes_pool.py (vestigial in the reference —
no config wires it — but inventoried): a history buffer of generated W
codes so the latent discriminator can train against past encoder outputs.
Host-side numpy state (it shuffles across steps, inherently impure), used
OUTSIDE the jitted train step; the sampled batch is fed in as a regular
device input.
"""

import numpy as np


class LatentCodesPool:
    """50%% of queries return (and replace) a stored code, 50%% pass through
    the fresh one; until the pool fills, codes pass through and are stored."""

    def __init__(self, pool_size: int, seed: int = 0):
        self.pool_size = pool_size
        self.ws = []
        self._rng = np.random.RandomState(seed)

    def query(self, ws: np.ndarray) -> np.ndarray:
        """ws: (B, 512) or (B, n_latent, 512). W+ entries have ONE random
        latent row picked (reference latent_codes_pool.py:34-37), so the
        result is always (B, 512)."""
        if self.pool_size == 0:
            return ws
        out = []
        for w in np.asarray(ws):
            if w.ndim == 2:
                w = w[self._rng.randint(len(w))]
            out.append(self._handle(w))
        return np.stack(out, 0)

    def _handle(self, w):
        if len(self.ws) < self.pool_size:
            self.ws.append(w)
            return w
        if self._rng.uniform() > 0.5:
            i = self._rng.randint(self.pool_size)
            tmp = self.ws[i].copy()
            self.ws[i] = w
            return tmp
        return w
