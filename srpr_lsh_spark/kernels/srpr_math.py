"""SRPR / BPR math kernels — vectorized numpy implementations of the
reference's model functions, re-derived from the formulas (not the loops):

- ``sigmoid`` — ``src/MatrixFactorization.h:54-56``
- ``p_srp`` (Eq. 9) — SRP bit-disagreement probability ``acos(cos)/π``,
  ``src/SRPRModel.h:149-156``
- ``gamma_uij`` (Eq. 5) — standardized preference margin,
  ``src/SRPRModel.h:159-166``
- ``norm_cdf`` Φ / ``norm_pdf`` φ — ``src/SRPRModel.h:168-178``
- ``bpr_triplet_grads`` — the BPR ascent step factors,
  ``src/MatrixFactorization.h:58-98``
- ``srpr_triplet_grads`` — the full Eq.5/Eq.9 chain rule,
  ``src/SRPRModel.h:60-133``

All functions operate on whole batches (m,) / (m, d) at once; no per-row
Python in any training pass.
"""

from __future__ import annotations

import math

import numpy as np

# the container has no scipy; math.erf via frompyfunc is exact and fast
# enough for (m,)-shaped training batches
try:  # pragma: no cover - environment dependent
    from scipy.special import erf as _erf
except ImportError:  # pragma: no cover
    _erf_ufunc = np.frompyfunc(math.erf, 1, 1)

    def _erf(x):
        return _erf_ufunc(np.asarray(x, dtype=np.float64)).astype(np.float64)


_SQRT2 = math.sqrt(2.0)
_INV_SQRT_2PI = 1.0 / math.sqrt(2.0 * math.pi)


def sigmoid(x: np.ndarray) -> np.ndarray:
    """Numerically-stable logistic function (MatrixFactorization.h:54-56)."""
    x = np.asarray(x, dtype=np.float64)
    out = np.empty_like(x)
    pos = x >= 0
    out[pos] = 1.0 / (1.0 + np.exp(-x[pos]))
    ex = np.exp(x[~pos])
    out[~pos] = ex / (1.0 + ex)
    return out


def norm_cdf(x: np.ndarray) -> np.ndarray:
    """Standard normal CDF Φ(x) = (1 + erf(x/√2))/2 (SRPRModel.h:168-173)."""
    return 0.5 * (1.0 + _erf(np.asarray(x, dtype=np.float64) / _SQRT2))


def norm_pdf(x: np.ndarray) -> np.ndarray:
    """Standard normal PDF φ(x) (SRPRModel.h:175-178)."""
    x = np.asarray(x, dtype=np.float64)
    return _INV_SQRT_2PI * np.exp(-0.5 * x * x)


def p_srp_from_cos(cos: np.ndarray) -> np.ndarray:
    """Eq. 9: P(one SRP bit differs) = acos(cos θ)/π (SRPRModel.h:149-156)."""
    return np.arccos(np.clip(cos, -1.0, 1.0)) / math.pi


def p_srp(v1: np.ndarray, v2: np.ndarray) -> np.ndarray:
    """Eq. 9 from raw vector batches (m, d); zero-magnitude rows → 0.5, the
    reference's degenerate-input convention (SRPRModel.h:150-153)."""
    n1 = np.linalg.norm(v1, axis=-1)
    n2 = np.linalg.norm(v2, axis=-1)
    ok = (n1 >= 1e-12) & (n2 >= 1e-12)
    cos = np.zeros_like(n1)
    np.divide(
        np.einsum("...d,...d->...", v1, v2), n1 * n2, out=cos, where=ok
    )
    out = p_srp_from_cos(cos)
    return np.where(ok, out, 0.5)


def gamma_uij(p_ui: np.ndarray, p_uj: np.ndarray) -> np.ndarray:
    """Eq. 5: (p_uj − p_ui) / √(σ²_ui + σ²_uj) with Bernoulli variances
    clipped at 1e-12 (SRPRModel.h:159-166)."""
    var_ui = np.maximum(1e-12, p_ui * (1.0 - p_ui))
    var_uj = np.maximum(1e-12, p_uj * (1.0 - p_uj))
    return (p_uj - p_ui) / np.sqrt(var_ui + var_uj)


def bpr_triplet_grads(
    xu: np.ndarray, yi: np.ndarray, yj: np.ndarray
) -> "tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]":
    """BPR ascent gradients for a batch of triplets, EXCLUDING the L2 term
    (regularization is applied at update time against the epoch-start factors,
    see ml/trainer.py).

    Returns (grad_xu, grad_yi, grad_yj, loglik) where loglik[i] = ln σ(x_uij).
    Matches MatrixFactorization.h:70-88: common = 1 − σ(x_uij),
    ∂/∂xu = common·(yi − yj), ∂/∂yi = common·xu, ∂/∂yj = −common·xu.
    """
    x_uij = np.einsum("md,md->m", xu, yi) - np.einsum("md,md->m", xu, yj)
    s = sigmoid(x_uij)
    common = (1.0 - s)[:, None]
    grad_xu = common * (yi - yj)
    grad_yi = common * xu
    grad_yj = -common * xu
    # log σ(x) computed stably: -log(1 + e^{-x}) = min(x,0) - log1p(e^{-|x|})
    loglik = np.minimum(x_uij, 0.0) - np.log1p(np.exp(-np.abs(x_uij)))
    return grad_xu, grad_yi, grad_yj, loglik


def srpr_triplet_grads(
    xu: np.ndarray, yi: np.ndarray, yj: np.ndarray, b: int
) -> "tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]":
    """SRPR ascent gradients for a batch of triplets, excluding the L2 term.

    The objective per triplet is ln Φ(√b · γ(p_ui, p_uj)) (SRPRModel.h:60-133);
    the chain rule below is the vectorized re-derivation:

        dL/dγ   = φ(z)/Φ(z) · √b,          z = √b γ
        dγ/dp_ui = −1/σ − (p_uj − p_ui)(0.5 − p_ui)/σ³
        dγ/dp_uj =  1/σ − (p_uj − p_ui)(0.5 − p_uj)/σ³
        dp/dcos  = −1/(π sin θ)
        dcos/dv  = the usual normalized-dot-product derivative

    Rows with any zero-magnitude vector, or with Φ(z) underflowing, get zero
    gradients (the reference `continue`s those rows; their loglik is still
    counted, SRPRModel.h:80-96).

    Returns (grad_xu, grad_yi, grad_yj, loglik), loglik[i] = ln(Φ(z) + 1e-12).
    """
    m, _ = xu.shape
    n_xu = np.linalg.norm(xu, axis=1)
    n_yi = np.linalg.norm(yi, axis=1)
    n_yj = np.linalg.norm(yj, axis=1)
    ok = (n_xu >= 1e-9) & (n_yi >= 1e-9) & (n_yj >= 1e-9)
    # guard the denominators; masked rows are zeroed at the end
    n_xu_s = np.where(n_xu < 1e-9, 1.0, n_xu)
    n_yi_s = np.where(n_yi < 1e-9, 1.0, n_yi)
    n_yj_s = np.where(n_yj < 1e-9, 1.0, n_yj)

    cos_ui = np.einsum("md,md->m", xu, yi) / (n_xu_s * n_yi_s)
    cos_uj = np.einsum("md,md->m", xu, yj) / (n_xu_s * n_yj_s)
    p_ui = np.where(ok, p_srp_from_cos(cos_ui), 0.5)
    p_uj = np.where(ok, p_srp_from_cos(cos_uj), 0.5)

    g = gamma_uij(p_ui, p_uj)
    z = math.sqrt(b) * g
    phi_z = norm_cdf(z)
    loglik = np.log(phi_z + 1e-12)

    live = ok & (phi_z >= 1e-12)
    grad_l_gamma = np.where(live, norm_pdf(z) / np.maximum(phi_z, 1e-12), 0.0) * math.sqrt(b)

    var_ui = np.maximum(1e-9, p_ui * (1.0 - p_ui))
    var_uj = np.maximum(1e-9, p_uj * (1.0 - p_uj))
    sigma_sq = var_ui + var_uj
    sigma = np.sqrt(sigma_sq)
    sigma_cubed = sigma_sq * sigma
    dg_dpui = -1.0 / sigma - (p_uj - p_ui) * (0.5 - p_ui) / sigma_cubed
    dg_dpuj = 1.0 / sigma - (p_uj - p_ui) * (0.5 - p_uj) / sigma_cubed

    sin_ui = np.sqrt(np.maximum(1e-9, 1.0 - cos_ui * cos_ui))
    sin_uj = np.sqrt(np.maximum(1e-9, 1.0 - cos_uj * cos_uj))
    dp_dcos_ui = -1.0 / (math.pi * sin_ui)
    dp_dcos_uj = -1.0 / (math.pi * sin_uj)

    c = lambda v: v[:, None]  # (m,) → (m,1) broadcast helper
    dcos_dxu_ui = yi / c(n_xu_s * n_yi_s) - xu * c(cos_ui / (n_xu_s * n_xu_s))
    dcos_dyi = xu / c(n_xu_s * n_yi_s) - yi * c(cos_ui / (n_yi_s * n_yi_s))
    dcos_dxu_uj = yj / c(n_xu_s * n_yj_s) - xu * c(cos_uj / (n_xu_s * n_xu_s))
    dcos_dyj = xu / c(n_xu_s * n_yj_s) - yj * c(cos_uj / (n_yj_s * n_yj_s))

    w = c(grad_l_gamma * np.where(live, 1.0, 0.0))
    grad_xu = w * (
        dcos_dxu_ui * c(dp_dcos_ui * dg_dpui) + dcos_dxu_uj * c(dp_dcos_uj * dg_dpuj)
    )
    grad_yi = w * dcos_dyi * c(dp_dcos_ui * dg_dpui)
    grad_yj = w * dcos_dyj * c(dp_dcos_uj * dg_dpuj)
    return grad_xu, grad_yi, grad_yj, loglik
