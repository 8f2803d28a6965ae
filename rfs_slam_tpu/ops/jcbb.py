"""JCBB — Joint Compatibility Branch & Bound, as a fixed-shape beam search.

Reference: JCBB.hpp:124-208 (interpretation-tree search, :344-520) with
incremental joint-innovation-covariance inverse via block updates
(JCBB.hpp:442-484) and chi-square gating (boost::math quantile, :463-467).
No reference executable uses JCBB (README.md:153-154) — it is a library
feature; we provide the same capability as a batched TPU op.

TPU mapping: the reference's depth-first branch & bound is replaced by a
**beam search over the interpretation tree** — measurements are processed in
sequence with `lax.scan`; each partial hypothesis assigns the current
measurement to an unused landmark or to "none" (clutter/missed), every
expansion is scored by (number of pairings, joint Mahalanobis distance) and
the top ``beam`` hypotheses survive.  Joint compatibility uses the same
incremental block inverse (Schur complement) as the reference, on padded
[Zd, Zd] buffers.  With ``beam`` at least the number of interpretation-tree
leaves the search is exhaustive (= exact JCBB); smaller beams are the
fixed-shape analog of the reference's bound-based pruning.

The chi-square quantile is the Wilson-Hilferty approximation (no SciPy
dependency; relative error < 1% for df >= 1 at the 0.9-0.99 confidence
levels used for gating).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def chi2_quantile(p, df):
    """Wilson-Hilferty approximation of the chi-square quantile.

    Replaces boost::math::quantile(chi_squared(df), p) (JCBB.hpp:463-467).
    """
    df = jnp.asarray(df, jnp.float32)
    z = jnp.sqrt(2.0) * jax.scipy.special.erfinv(2.0 * jnp.asarray(p) - 1.0)
    t = 1.0 - 2.0 / (9.0 * df) + z * jnp.sqrt(2.0 / (9.0 * df))
    return df * t**3


def jcbb(
    innov: jax.Array,        # [Z, M, D] innovation of measurement z vs lmk m
    S: jax.Array,            # [Z, M, Z, M, D, D] joint innovation covariance
                             # blocks: cov(nu[z1,m1], nu[z2,m2])
    z_mask: jax.Array,       # [Z] valid measurements
    m_mask: jax.Array,       # [M] valid landmarks
    confidence: float = 0.95,
    beam: int = 32,
):
    """Joint-compatibility data association.

    Returns ``(assoc [Z] int32, n_paired, md2)``: landmark index per
    measurement (-1 = unassociated), maximizing the number of jointly
    compatible pairings with minimal joint Mahalanobis distance as the
    tie-break (the JCBB objective, JCBB.hpp:344-520).

    ``S`` carries the full joint covariance so correlated landmark estimates
    (dense EKF-SLAM covariance) are supported; for block-diagonal
    (independent-landmark) problems use :func:`jcbb_block_diag`.
    """
    Z, M, D = innov.shape
    ZD = Z * D
    B = beam
    # lexicographic (pairings, -md2) score: the chi-square gate bounds any
    # surviving md2 by the full-cardinality threshold, so a small constant
    # keeps both terms within float32 precision
    LEX = chi2_quantile(confidence, Z * D) + 1.0
    NEG = jnp.float32(-1e30)

    # hypothesis state (per beam slot):
    #   assoc  [B, Z]  int32, -1 none (future steps: -2 untouched)
    #   used   [B, M]  bool
    #   n_pair [B]     int32
    #   kinv   [B, ZD, ZD]  inverse of the joint S over the paired blocks
    #                        (padded identity elsewhere)
    #   nu     [B, ZD]      stacked innovation (zeros where unpaired)
    #   sel    [B, ZD] bool rows/cols of kinv in use
    #   md2    [B]
    #   alive  [B]
    assoc0 = jnp.full((B, Z), -1, jnp.int32)
    used0 = jnp.zeros((B, M), bool)
    npair0 = jnp.zeros((B,), jnp.int32)
    kinv0 = jnp.broadcast_to(jnp.eye(ZD), (B, ZD, ZD))
    nu0 = jnp.zeros((B, ZD))
    sel0 = jnp.zeros((B, ZD), bool)
    md20 = jnp.zeros((B,))
    alive0 = jnp.zeros((B,), bool).at[0].set(True)

    def expand(carry, zi):
        assoc, used, npair, kinv, nu, sel, md2, alive = carry
        # candidate assignments for measurement zi: M landmarks + "none"
        # score each (b, m) expansion
        nu_zi = innov[zi]                                   # [M, D]
        # cross blocks between candidate (zi, m) and already-paired (zj, mj):
        # C[b, m, ZD] rows — gather S[zi, m, zj, assoc[b, zj]] for paired zj
        zj = jnp.arange(Z)
        a_clip = jnp.clip(assoc, 0, M - 1)                  # [B, Z]
        # gather cov(new block, each paired old block):
        # C6[b, m, z, d_new, d_old] = S[zi, m, z, assoc[b, z], d_new, d_old]
        S_zi = jnp.broadcast_to(S[zi][None], (B, M, Z, M, D, D))
        idx = jnp.broadcast_to(
            a_clip[:, None, :, None, None, None], (B, M, Z, 1, D, D))
        C6 = jnp.take_along_axis(S_zi, idx, axis=3)[:, :, :, 0]
        paired = (assoc >= 0)                               # [B, Z]
        C6 = jnp.where(paired[:, None, :, None, None], C6, 0.0)
        # stack old blocks: C[b, m, d_new, z*D + d_old]
        C = C6.transpose(0, 1, 3, 2, 4).reshape(B, M, D, ZD)

        S_new = S[zi, :, zi, :, :, :][jnp.arange(M), jnp.arange(M)]  # [M, D, D]

        # Schur update: md2_new = md2 + (nu_n - C K nu_o)^T W (nu_n - C K nu_o)
        # with W = inv(S_new - C K C^T)
        K = kinv * (sel[:, :, None] & sel[:, None, :])      # zero padding
        CK = jnp.einsum("bmdz,bzy->bmdy", C, K)             # [B, M, D, ZD]
        S_cond = S_new[None] - jnp.einsum("bmdz,bmez->bmde", CK, C)
        S_cond = 0.5 * (S_cond + jnp.swapaxes(S_cond, -1, -2))
        W = jnp.linalg.inv(S_cond + 1e-9 * jnp.eye(D))
        r = nu_zi[None] - jnp.einsum("bmdz,bz->bmd", CK, nu)  # [B, M, D]
        dmd2 = jnp.einsum("bmd,bmde,bme->bm", r, W, r)      # [B, M]

        n_new = npair[:, None] + 1
        thresh = chi2_quantile(confidence, (n_new * D).astype(jnp.float32))
        md2_new = md2[:, None] + dmd2
        feasible = (
            alive[:, None] & m_mask[None, :] & ~used
            & (md2_new <= thresh) & z_mask[zi]
        )

        # score: maximize pairings, then minimize md2
        cand_score = jnp.where(
            feasible, n_new.astype(jnp.float32) * LEX - md2_new, NEG)
        none_score = jnp.where(
            alive, npair.astype(jnp.float32) * LEX - md2, NEG)
        scores = jnp.concatenate([cand_score.reshape(-1), none_score])
        top = jax.lax.top_k(scores, B)[1]                   # flat indices

        is_none = top >= B * M
        b_idx = jnp.where(is_none, top - B * M, top // M)
        m_idx = jnp.where(is_none, 0, top % M)
        valid = jnp.where(
            is_none, alive[b_idx], feasible[b_idx, m_idx])

        # build new beam
        assoc_n = assoc[b_idx].at[:, zi].set(
            jnp.where(is_none, -1, m_idx.astype(jnp.int32)))
        used_n = used[b_idx] | (
            jax.nn.one_hot(m_idx, M, dtype=bool) & ~is_none[:, None])
        npair_n = jnp.where(is_none, npair[b_idx], npair[b_idx] + 1)
        md2_n = jnp.where(is_none, md2[b_idx], md2_new[b_idx, m_idx])

        # kinv block update (only for paired expansions)
        slot = zi * D
        K_b = K[b_idx]
        CK_b = CK[b_idx, m_idx]                             # [B, D, ZD]
        W_b = W[b_idx, m_idx]                               # [B, D, D]
        KCT = jnp.swapaxes(CK_b, -1, -2)                    # [B, ZD, D] = K C^T
        upd_oo = K_b + jnp.einsum("bzd,bde,bye->bzy", KCT, W_b, KCT)
        upd_on = -jnp.einsum("bzd,bde->bze", KCT, W_b)      # [B, ZD, D]
        kinv_n = upd_oo
        kinv_n = jax.lax.dynamic_update_slice(
            kinv_n, upd_on, (0, 0, slot))
        kinv_n = jax.lax.dynamic_update_slice(
            kinv_n, jnp.swapaxes(upd_on, -1, -2), (0, slot, 0))
        kinv_n = jax.lax.dynamic_update_slice(kinv_n, W_b, (0, slot, slot))
        kinv_n = jnp.where(is_none[:, None, None], kinv[b_idx], kinv_n)

        nu_n = jax.lax.dynamic_update_slice(
            nu[b_idx], jnp.where(is_none[:, None], 0.0, nu_zi[m_idx]),
            (0, slot))
        sel_pad = jnp.zeros((B, ZD), bool)
        sel_pad = jax.lax.dynamic_update_slice(
            sel_pad, jnp.broadcast_to(~is_none[:, None], (B, D)), (0, slot))
        sel_n = sel[b_idx] | sel_pad

        return (assoc_n, used_n, npair_n, kinv_n, nu_n, sel_n, md2_n,
                valid), None

    carry = (assoc0, used0, npair0, kinv0, nu0, sel0, md20, alive0)
    carry, _ = jax.lax.scan(expand, carry, jnp.arange(Z))
    assoc, used, npair, kinv, nu, sel, md2, alive = carry

    best = jnp.argmax(
        jnp.where(alive, npair.astype(jnp.float32) * LEX - md2, NEG))
    return assoc[best], npair[best], md2[best]


def jcbb_block_diag(
    innov: jax.Array,        # [Z, M, D]
    S_diag: jax.Array,       # [M, D, D] per-landmark innovation covariance
    z_mask: jax.Array,
    m_mask: jax.Array,
    confidence: float = 0.95,
    beam: int = 32,
):
    """JCBB for independent landmark estimates (block-diagonal joint
    covariance; JCBB.hpp:401-440 "block-diagonal estimate covariance").
    """
    Z, M, D = innov.shape
    S = jnp.zeros((Z, M, Z, M, D, D))
    zi = jnp.arange(Z)
    mi = jnp.arange(M)
    S = S.at[zi[:, None], mi[None, :], zi[:, None], mi[None, :]].set(
        jnp.broadcast_to(S_diag[None], (Z, M, D, D)))
    return jcbb(innov, S, z_mask, m_mask, confidence, beam)
