"""Reference-semantics test oracles (test-only code, never imported by the
package).

``mas_oracle`` models the observable behavior of the reference's monotonic
alignment search (/root/reference/models/glow_tts/submodules.py:28-67): a
Viterbi-style DP that, given per-(token, frame) log-likelihoods and a
rectangular validity mask, returns the best monotone surjective alignment
path. It is written per-sample from the recurrence definition

    score[0, 0] = value[0, 0]
    score[i, j] = value[i, j] + max(score[i, j-1], score[i-1, j-1])
    (ties break toward staying on the same token)

rather than transcribed from the reference's vectorized loop, and is checked
against the production implementations (ops/mas.py lax.scan, ops/pallas/mas)
in tests/test_ops.py.
"""

from __future__ import annotations

import numpy as np

_NEG = -np.inf


def mas_oracle(value: np.ndarray, mask: np.ndarray) -> np.ndarray:
    """Best monotone alignment path per sample.

    value, mask: [b, t_x, t_y]; mask is the outer product of a token mask
    (first x_len rows) and a frame mask (first y_len cols). Returns a 0/1
    float path of the same shape with exactly one token per valid frame.
    """
    value = np.asarray(value, dtype=np.float64) * mask
    b, t_x, t_y = value.shape
    path = np.zeros((b, t_x, t_y), dtype=np.float32)
    for n in range(b):
        x_len = int(mask[n, :, 0].sum())
        y_len = int(mask[n, 0, :].sum())
        # Forward DP over frames. stay[i, j] == 1 means the best path into
        # (i, j) came from (i, j-1); 0 means it came from (i-1, j-1).
        score = np.full((t_x,), _NEG)
        stay = np.ones((t_x, t_y), dtype=np.int64)
        score[0] = value[n, 0, 0]
        for j in range(1, y_len):
            from_same = score
            from_prev = np.concatenate(([_NEG], score[:-1]))
            stay[:, j] = from_same >= from_prev
            score = np.maximum(from_same, from_prev) + value[n, :, j]
            # a monotone path starting at token 0 cannot reach token i>j
            score[j + 1:] = _NEG
        # Backtrack from the (last token, last frame) corner.
        i = x_len - 1
        for j in range(y_len - 1, -1, -1):
            path[n, i, j] = 1.0
            i += stay[i, j] - 1
    return path
