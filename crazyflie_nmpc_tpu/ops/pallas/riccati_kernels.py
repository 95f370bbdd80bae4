"""Fused Pallas TPU kernels for the batched Riccati recursion.

Why these exist (measured on v5e): XLA executes each HLO op / loop
iteration with a large fixed overhead, and lowers batched 13x13 matmuls at
<0.1% of MXU peak — so the 50-stage Riccati scan costs ~30 ms at B=1024 in
pure XLA even though the math is ~2 Mflop/stage.  These kernels fuse an
ENTIRE backward or forward sweep into one kernel launch: the stage loop is
the Pallas grid (sequential on TPU), the cost-to-go (P, p) is carried in
VMEM scratch across grid steps, and per-stage problem data streams
HBM->VMEM through the BlockSpec pipeline.

Layout: batch-LAST.  A matrix batch is shaped (N, n, m, B): the trailing
B axis maps onto VPU lanes, so every matrix element is a (B,)-vector and a
13x13 matmul is 13 broadcasted FMAs on (13,13,B) tiles — pure VPU work at
full lane occupancy, no MXU padding waste.  All small-matrix algebra
(4x4 Cholesky, triangular solves) is unrolled at trace time.

Cost structure: DIAGONAL.  The reference OCP family is linear-least-squares
with selector Vx/Vu (generate_c_code.py:62-129), so Qxx = diag(q), Ruu =
diag(r) + IPM barrier shift (still diagonal), S = 0, and W_e = 50 Q is
diagonal.  The kernels take the cost as (N, n, B) diagonals — this is the
HPIPM move of exploiting problem structure in the hot path, and it cuts
HBM traffic per IPM iteration by ~45% vs hauling dense blocks.  Likewise
the backward sweep emits `Pc[k] = P_{k+1} c_k` (13 floats/stage) instead of
the dense P_{k+1} (169 floats/stage): that vector is the only thing the
Mehrotra corrector's second backward pass needs.  The general dense-cost
path lives in `ops.riccati` / `ops.ipm` (XLA).

Kernels:
  backward_sweep:        Riccati factorization + affine pass ->
                         (K, kff, L, Pc) per stage (L = chol(Quu) packed)
  forward_sweep:         dx_{k+1} = A dx + B du + c with du = K dx + kff
  backward_vector_sweep: affine pass only, reusing stored (K, L, Pc)
                         (the Mehrotra corrector's second RHS)

The mathematical contract matches `ops.riccati` with the diagonals embedded
dense (tested in tests/test_pallas_kernels.py, incl. interpret mode on CPU).
"""

from __future__ import annotations

import functools as _ft

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NX = 13
NU = 4
NL = NU * (NU + 1) // 2  # packed lower-triangular Cholesky entries


# ---------------------------------------------------------------------------
# trace-time small-matrix algebra on (n, m, B) tiles
# ---------------------------------------------------------------------------

def _col(x, i):
    """Basic-slice x[:, i, :] as (n, 1, B) without mixed int/newaxis
    indexing (which Mosaic lowers as an unsupported gather)."""
    return x[:, i:i + 1, :]


def _row(x, i):
    """Basic-slice x[i, :, :] as (1, m, B)."""
    return x[i:i + 1, :, :]


def _mm(a, b, n, k, m):
    """(n,k,B) @ (k,m,B) -> (n,m,B) via k-loop of broadcast FMAs."""
    c = _col(a, 0) * _row(b, 0)
    for i in range(1, k):
        c = c + _col(a, i) * _row(b, i)
    return c


def _mtm(a, b, k, n, m):
    """a^T b: (k,n,B),(k,m,B) -> (n,m,B)."""
    c = jnp.swapaxes(_row(a, 0), 0, 1) * _row(b, 0)
    for i in range(1, k):
        c = c + jnp.swapaxes(_row(a, i), 0, 1) * _row(b, i)
    return c


def _mv(a, v, n, k):
    """(n,k,B) @ (k,B) -> (n,B)."""
    c = a[:, 0, :] * v[0:1, :]
    for i in range(1, k):
        c = c + a[:, i, :] * v[i:i + 1, :]
    return c


def _mtv(a, v, k, n):
    """a^T v: (k,n,B),(k,B) -> (n,B)."""
    c = a[0, :, :] * v[0:1, :]
    for i in range(1, k):
        c = c + a[i, :, :] * v[i:i + 1, :]
    return c


def _add_diag(M, d, n):
    """M (n,n,B) + diag(d) with d (n,B), via a trace-time eye broadcast."""
    eye = jnp.eye(n, dtype=M.dtype)[:, :, None]
    return M + eye * d[None, :, :]


def _chol4(M):
    """Unrolled 4x4 Cholesky of (4,4,B) -> packed lower (10,B).

    rsqrt formulation (same move as condensed_kernels._chol_n, measured
    in the round-4 op-deletion ablation): each column's sqrt + divides
    become one rsqrt + multiplies — VPU divide throughput is the cost
    driver of the chol/solve group, not its MACs."""
    r00 = jax.lax.rsqrt(M[0, 0])
    l00 = M[0, 0] * r00
    l10 = M[1, 0] * r00
    l20 = M[2, 0] * r00
    l30 = M[3, 0] * r00
    d11 = M[1, 1] - l10 * l10
    r11 = jax.lax.rsqrt(d11)
    l11 = d11 * r11
    l21 = (M[2, 1] - l20 * l10) * r11
    l31 = (M[3, 1] - l30 * l10) * r11
    d22 = M[2, 2] - l20 * l20 - l21 * l21
    r22 = jax.lax.rsqrt(d22)
    l22 = d22 * r22
    l32 = (M[3, 2] - l30 * l20 - l31 * l21) * r22
    d33 = M[3, 3] - l30 * l30 - l31 * l31 - l32 * l32
    l33 = d33 * jax.lax.rsqrt(d33)
    return jnp.stack([l00, l10, l20, l30, l11, l21, l31, l22, l32, l33])


def _unpack_L(L):
    return (L[0], L[1], L[2], L[3], L[4], L[5], L[6], L[7], L[8], L[9])


def _inv4(L):
    """Reciprocals of the packed diagonal, hoisted once per solve (lane-
    wide divides per substitution row measured ~2x their replacement FMA;
    docs/PERF.md speed-of-light ablation)."""
    return 1.0 / L[0], 1.0 / L[4], 1.0 / L[7], 1.0 / L[9]


def _cho_solve4(L, Y, m):
    """Solve (L L^T) X = Y with packed L (10,B), Y (4,m,B) -> (4,m,B)."""
    l00, l10, l20, l30, l11, l21, l31, l22, l32, l33 = _unpack_L(L)
    i00, i11, i22, i33 = _inv4(L)
    # forward: L Z = Y
    z0 = Y[0] * i00[None, :]
    z1 = (Y[1] - l10[None, :] * z0) * i11[None, :]
    z2 = (Y[2] - l20[None, :] * z0 - l21[None, :] * z1) * i22[None, :]
    z3 = (Y[3] - l30[None, :] * z0 - l31[None, :] * z1
          - l32[None, :] * z2) * i33[None, :]
    # backward: L^T X = Z
    x3 = z3 * i33[None, :]
    x2 = (z2 - l32[None, :] * x3) * i22[None, :]
    x1 = (z1 - l21[None, :] * x2 - l31[None, :] * x3) * i11[None, :]
    x0 = (z0 - l10[None, :] * x1 - l20[None, :] * x2
          - l30[None, :] * x3) * i00[None, :]
    return jnp.stack([x0, x1, x2, x3])


def _cho_solve4_vec(L, y):
    """Solve (L L^T) x = y with packed L (10,B), y (4,B) -> (4,B)."""
    l00, l10, l20, l30, l11, l21, l31, l22, l32, l33 = _unpack_L(L)
    i00, i11, i22, i33 = _inv4(L)
    z0 = y[0] * i00
    z1 = (y[1] - l10 * z0) * i11
    z2 = (y[2] - l20 * z0 - l21 * z1) * i22
    z3 = (y[3] - l30 * z0 - l31 * z1 - l32 * z2) * i33
    x3 = z3 * i33
    x2 = (z2 - l32 * x3) * i22
    x1 = (z1 - l21 * x2 - l31 * x3) * i11
    x0 = (z0 - l10 * x1 - l20 * x2 - l30 * x3) * i00
    return jnp.stack([x0, x1, x2, x3])


# ---------------------------------------------------------------------------
# backward sweep: factorization + affine vector pass (diagonal cost)
# ---------------------------------------------------------------------------

def _backward_kernel(ns, A_ref, B_ref, c_ref, qxx_ref, qx_ref, ruu_ref,
                     ru_ref, Pt_ref, pt_ref,
                     K_out, kff_out, L_out, Pc_out,
                     P_scr, p_scr):
    n = pl.program_id(1)

    @pl.when(n == 0)
    def _():
        # terminal cost-to-go: diagonal W_e
        eye = jnp.eye(NX, dtype=Pt_ref.dtype)[:, :, None]
        P_scr[:] = eye * Pt_ref[:][None, :, :]
        p_scr[:] = pt_ref[:]

    # blocks hold `ns` stages, stored forward-ordered; sweep them in
    # reverse (stage N-1 is block [-1] of grid step 0)
    for j in range(ns - 1, -1, -1):
        A = A_ref[j]      # (13, 13, Bt)
        Bm = B_ref[j]     # (13, 4, Bt)
        c = c_ref[j]      # (13, Bt)
        P = P_scr[:]      # (13, 13, Bt)
        p = p_scr[:]      # (13, Bt)

        PA = _mm(P, A, NX, NX, NX)                    # (13,13,B)
        PB = _mm(P, Bm, NX, NX, NU)                   # (13,4,B)
        Pc = _mv(P, c, NX, NX)                        # (13,B)
        m = p + Pc
        Quu = _add_diag(_mtm(Bm, PB, NX, NU, NU), ruu_ref[j], NU)
        Qux = _mtm(Bm, PA, NX, NU, NX)                # S = 0
        Qu = ru_ref[j] + _mtv(Bm, m, NX, NU)          # (4,B)

        L = _chol4(Quu)                               # (10,B)
        K = -_cho_solve4(L, Qux, NX)                  # (4,13,B)
        kff = -_cho_solve4_vec(L, Qu)                 # (4,B)

        # P' = diag(qxx) + A'PA + Qux'K ; p' = qx + A'm + K'Qu (same
        # algebra as ops.riccati.factorize / backward_vector)
        APA = _mtm(A, PA, NX, NX, NX)
        QK = _mtm(Qux, K, NU, NX, NX)
        P_new = _add_diag(APA + QK, qxx_ref[j], NX)
        P_new = 0.5 * (P_new + jnp.swapaxes(P_new, 0, 1))
        p_new = qx_ref[j] + _mtv(A, m, NX, NX) + _mtv(K, Qu, NU, NX)

        K_out[j] = K
        kff_out[j] = kff
        L_out[j] = L
        Pc_out[j] = Pc  # P_{k+1} c_k: all the corrector needs of P

        P_scr[:] = P_new
        p_scr[:] = p_new


def backward_sweep(A, B, c, qxx, qx, ruu, ru, pT, p_term,
                   block_b: int = 128, stages_per_step: int = 1,
                   interpret: bool = False):
    """Fused Riccati backward sweep (factorize + affine pass).

    Args (batch-last layout, diagonal cost):
      A (N,13,13,Bt*G), B (N,13,4,·), c (N,13,·), qxx (N,13,·) stage-cost
      diagonal, qx (N,13,·), ruu (N,4,·) input-cost diagonal (incl. any IPM
      barrier shift), ru (N,4,·), pT (13,·) terminal-cost diagonal,
      p_term (13,·).
    Returns (K (N,4,13,·), kff (N,4,·), L (N,10,·), Pc (N,13,·)) where
    Pc[k] = P_{k+1} c_k — exactly what `backward_vector_sweep` needs to
    re-solve with a new RHS.
    """
    N = A.shape[0]
    Btot = A.shape[-1]
    dtype = A.dtype
    if Btot % block_b != 0:
        raise ValueError(f"batch {Btot} must be divisible by {block_b}")
    if N % stages_per_step != 0:
        raise ValueError(f"N={N} must be divisible by {stages_per_step}")
    nb = Btot // block_b
    ns = stages_per_step
    ngrid = N // ns

    def spec(shape_prefix):
        # stage-block-streamed input, swept in reverse block order
        def idx(b, n):
            return (ngrid - 1 - n,) + (0,) * len(shape_prefix) + (b,)
        return pl.BlockSpec((ns,) + shape_prefix + (block_b,), idx,
                            memory_space=pltpu.VMEM)

    def spec_const(shape_prefix):
        def idx(b, n):
            return (0,) * len(shape_prefix) + (b,)
        return pl.BlockSpec(shape_prefix + (block_b,), idx,
                            memory_space=pltpu.VMEM)

    grid = (nb, ngrid)
    out_shape = (
        jax.ShapeDtypeStruct((N, NU, NX, Btot), dtype),   # K
        jax.ShapeDtypeStruct((N, NU, Btot), dtype),       # kff
        jax.ShapeDtypeStruct((N, NL, Btot), dtype),       # L packed
        jax.ShapeDtypeStruct((N, NX, Btot), dtype),       # Pc
    )
    out_specs = (
        spec((NU, NX)),
        spec((NU,)),
        spec((NL,)),
        spec((NX,)),
    )
    in_specs = [
        spec((NX, NX)), spec((NX, NU)), spec((NX,)),
        spec((NX,)), spec((NX,)),
        spec((NU,)), spec((NU,)),
        spec_const((NX,)), spec_const((NX,)),
    ]
    scratch = [
        pltpu.VMEM((NX, NX, block_b), dtype),
        pltpu.VMEM((NX, block_b), dtype),
    ]
    return pl.pallas_call(
        _ft.partial(_backward_kernel, ns),
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=scratch,
        interpret=interpret,
    )(A, B, c, qxx, qx, ruu, ru, pT, p_term)


# ---------------------------------------------------------------------------
# forward sweep
# ---------------------------------------------------------------------------

def _forward_kernel(ns, A_ref, B_ref, c_ref, K_ref, kff_ref, dx0_ref,
                    dx_out, du_out, dx_scr):
    n = pl.program_id(1)

    @pl.when(n == 0)
    def _():
        dx_scr[:] = dx0_ref[:]

    for j in range(ns):
        dx = dx_scr[:]                                 # (13,B)
        du = _mv(K_ref[j], dx, NU, NX) + kff_ref[j]    # (4,B)
        dx_next = (_mv(A_ref[j], dx, NX, NX)
                   + _mv(B_ref[j], du, NX, NU) + c_ref[j])
        dx_out[j] = dx
        du_out[j] = du
        dx_scr[:] = dx_next


def forward_sweep(A, B, c, K, kff, dx0, block_b: int = 128,
                  stages_per_step: int = 1, interpret: bool = False):
    """Fused forward rollout.  Returns (dx (N+1,13,·), du (N,4,·)).

    The final state dx[N] is reconstructed outside the kernel (one batched
    affine step) to keep the kernel's output blocks uniform.
    """
    N = A.shape[0]
    Btot = A.shape[-1]
    dtype = A.dtype
    nb = Btot // block_b
    ns = stages_per_step
    if N % ns != 0:
        raise ValueError(f"N={N} must be divisible by {ns}")

    def spec(shape_prefix):
        def idx(b, n):
            return (n,) + (0,) * len(shape_prefix) + (b,)
        return pl.BlockSpec((ns,) + shape_prefix + (block_b,), idx,
                            memory_space=pltpu.VMEM)

    def spec_const(shape_prefix):
        def idx(b, n):
            return (0,) * len(shape_prefix) + (b,)
        return pl.BlockSpec(shape_prefix + (block_b,), idx,
                            memory_space=pltpu.VMEM)

    dxs, dus = pl.pallas_call(
        _ft.partial(_forward_kernel, ns),
        grid=(nb, N // ns),
        in_specs=[spec((NX, NX)), spec((NX, NU)), spec((NX,)),
                  spec((NU, NX)), spec((NU,)), spec_const((NX,))],
        out_specs=(spec((NX,)), spec((NU,))),
        out_shape=(jax.ShapeDtypeStruct((N, NX, Btot), dtype),
                   jax.ShapeDtypeStruct((N, NU, Btot), dtype)),
        scratch_shapes=[pltpu.VMEM((NX, block_b), dtype)],
        interpret=interpret,
    )(A, B, c, K, kff, dx0)
    # last state: dx_N = A dx_{N-1} + B du_{N-1} + c_{N-1}
    dx_last = (jnp.einsum("ijb,jb->ib", A[-1], dxs[-1])
               + jnp.einsum("ijb,jb->ib", B[-1], dus[-1]) + c[-1])
    dx_all = jnp.concatenate([dxs, dx_last[None]], axis=0)
    return dx_all, dus


# ---------------------------------------------------------------------------
# fused KKT sweep: backward factorization + forward rollout in ONE kernel
# ---------------------------------------------------------------------------
# The TPU grid is sequential, so a single kernel can run two phases over the
# stage axis: grid steps [0, ngrid) sweep stages in reverse (Riccati), grid
# steps [ngrid, 2*ngrid) sweep forward (rollout).  The gains K and
# feedforwards kff for the WHOLE horizon are kept in VMEM scratch between
# phases (N * (4*13 + 4) * block_b floats ~ 1.4 MB at block_b=128), so the
# forward phase never re-reads them from HBM and the launch count per IPM
# iteration halves.
#
# Output-block discipline: Pallas writes an output block back to HBM only
# when its index map changes between grid steps, so each output's index is
# PINNED to a constant block during its inactive phase (the factorization
# outputs stay on their last-written block 0 through phase 2; the rollout
# outputs sit on block 0 through phase 1, unwritten garbage never flushed
# because the index first changes only after phase 2 has written it).

def _kkt_kernel(ns, ngrid, A_ref, B_ref, c_ref, qxx_ref, qx_ref, ruu_ref,
                ru_ref, Pt_ref, pt_ref, dx0_ref,
                K_out, kff_out, L_out, Pc_out, dx_out, du_out,
                P_scr, p_scr, K_all, kff_all, dx_scr):
    n = pl.program_id(1)

    @pl.when(n == 0)
    def _():
        eye = jnp.eye(NX, dtype=Pt_ref.dtype)[:, :, None]
        P_scr[:] = eye * Pt_ref[:][None, :, :]
        p_scr[:] = pt_ref[:]

    @pl.when(n < ngrid)
    def _backward_phase():
        base = (ngrid - 1 - n) * ns
        for j in range(ns - 1, -1, -1):
            A = A_ref[j]
            Bm = B_ref[j]
            c = c_ref[j]
            P = P_scr[:]
            p = p_scr[:]

            PA = _mm(P, A, NX, NX, NX)
            PB = _mm(P, Bm, NX, NX, NU)
            Pc = _mv(P, c, NX, NX)
            m = p + Pc
            Quu = _add_diag(_mtm(Bm, PB, NX, NU, NU), ruu_ref[j], NU)
            Qux = _mtm(Bm, PA, NX, NU, NX)
            Qu = ru_ref[j] + _mtv(Bm, m, NX, NU)

            L = _chol4(Quu)
            K = -_cho_solve4(L, Qux, NX)
            kff = -_cho_solve4_vec(L, Qu)

            APA = _mtm(A, PA, NX, NX, NX)
            QK = _mtm(Qux, K, NU, NX, NX)
            P_new = _add_diag(APA + QK, qxx_ref[j], NX)
            P_new = 0.5 * (P_new + jnp.swapaxes(P_new, 0, 1))
            p_new = qx_ref[j] + _mtv(A, m, NX, NX) + _mtv(K, Qu, NU, NX)

            K_out[j] = K
            kff_out[j] = kff
            L_out[j] = L
            Pc_out[j] = Pc
            K_all[pl.dslice(base + j, 1)] = K[None]
            kff_all[pl.dslice(base + j, 1)] = kff[None]

            P_scr[:] = P_new
            p_scr[:] = p_new

    @pl.when(n == ngrid)
    def _():
        dx_scr[:] = dx0_ref[:]

    @pl.when(n >= ngrid)
    def _forward_phase():
        base = (n - ngrid) * ns
        for j in range(ns):
            dx = dx_scr[:]
            K = K_all[pl.dslice(base + j, 1)][0]
            kff = kff_all[pl.dslice(base + j, 1)][0]
            du = _mv(K, dx, NU, NX) + kff
            dx_next = (_mv(A_ref[j], dx, NX, NX)
                       + _mv(B_ref[j], du, NX, NU) + c_ref[j])
            dx_out[j] = dx
            du_out[j] = du
            dx_scr[:] = dx_next


def kkt_sweep(A, B, c, qxx, qx, ruu, ru, pT, p_term, dx0,
              block_b: int = 128, stages_per_step: int = 1,
              interpret: bool = False):
    """Fused backward factorization + forward rollout (one launch).

    Same contract as backward_sweep followed by forward_sweep:
    returns (K, kff, L, Pc, dx (N+1,13,·), du (N,4,·)).
    """
    N = A.shape[0]
    Btot = A.shape[-1]
    dtype = A.dtype
    if Btot % block_b != 0:
        raise ValueError(f"batch {Btot} must be divisible by {block_b}")
    ns = stages_per_step
    if N % ns != 0:
        raise ValueError(f"N={N} must be divisible by {ns}")
    nb = Btot // block_b
    ngrid = N // ns

    def mk_spec(shape_prefix, idx_of_n):
        def idx(b, n):
            return (idx_of_n(n),) + (0,) * len(shape_prefix) + (b,)
        return pl.BlockSpec((ns,) + shape_prefix + (block_b,), idx,
                            memory_space=pltpu.VMEM)

    # streamed in both phases (A, B, c): reverse then forward
    both = lambda sp: mk_spec(
        sp, lambda n: jnp.where(n < ngrid, ngrid - 1 - n, n - ngrid))
    # consumed in the backward phase only: pin to block 0 during phase 2
    bwd = lambda sp: mk_spec(
        sp, lambda n: jnp.where(n < ngrid, ngrid - 1 - n, 0))
    # produced in the forward phase only: parked on block 0 during phase 1
    fwd = lambda sp: mk_spec(
        sp, lambda n: jnp.where(n < ngrid, 0, n - ngrid))

    def spec_const(shape_prefix):
        def idx(b, n):
            return (0,) * len(shape_prefix) + (b,)
        return pl.BlockSpec(shape_prefix + (block_b,), idx,
                            memory_space=pltpu.VMEM)

    out_shape = (
        jax.ShapeDtypeStruct((N, NU, NX, Btot), dtype),   # K
        jax.ShapeDtypeStruct((N, NU, Btot), dtype),       # kff
        jax.ShapeDtypeStruct((N, NL, Btot), dtype),       # L packed
        jax.ShapeDtypeStruct((N, NX, Btot), dtype),       # Pc
        jax.ShapeDtypeStruct((N, NX, Btot), dtype),       # dx (w/o last)
        jax.ShapeDtypeStruct((N, NU, Btot), dtype),       # du
    )
    out_specs = (bwd((NU, NX)), bwd((NU,)), bwd((NL,)), bwd((NX,)),
                 fwd((NX,)), fwd((NU,)))
    in_specs = [
        both((NX, NX)), both((NX, NU)), both((NX,)),
        bwd((NX,)), bwd((NX,)),
        bwd((NU,)), bwd((NU,)),
        spec_const((NX,)), spec_const((NX,)), spec_const((NX,)),
    ]
    scratch = [
        pltpu.VMEM((NX, NX, block_b), dtype),      # P
        pltpu.VMEM((NX, block_b), dtype),          # p
        pltpu.VMEM((N, NU, NX, block_b), dtype),   # K (whole horizon)
        pltpu.VMEM((N, NU, block_b), dtype),       # kff (whole horizon)
        pltpu.VMEM((NX, block_b), dtype),          # dx carry
    ]
    K, kff, L, Pc, dxs, dus = pl.pallas_call(
        _ft.partial(_kkt_kernel, ns, ngrid),
        grid=(nb, 2 * ngrid),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=scratch,
        interpret=interpret,
    )(A, B, c, qxx, qx, ruu, ru, pT, p_term, dx0)
    dx_last = (jnp.einsum("ijb,jb->ib", A[-1], dxs[-1])
               + jnp.einsum("ijb,jb->ib", B[-1], dus[-1]) + c[-1])
    dx_all = jnp.concatenate([dxs, dx_last[None]], axis=0)
    return K, kff, L, Pc, dx_all, dus


# ---------------------------------------------------------------------------
# fused corrector sweep: vector backward + forward rollout in ONE kernel
# ---------------------------------------------------------------------------

def _corrector_kernel(ns, ngrid, A_ref, B_ref, c_ref, qx_ref, ru_ref,
                      K_ref, L_ref, Pc_ref, pt_ref, dx0_ref,
                      dx_out, du_out, p_scr, kff_all, dx_scr):
    n = pl.program_id(1)

    @pl.when(n == 0)
    def _():
        p_scr[:] = pt_ref[:]

    @pl.when(n < ngrid)
    def _backward_phase():
        base = (ngrid - 1 - n) * ns
        for j in range(ns - 1, -1, -1):
            A = A_ref[j]
            Bm = B_ref[j]
            p = p_scr[:]
            m = p + Pc_ref[j]
            Qu = ru_ref[j] + _mtv(Bm, m, NX, NU)
            kff = -_cho_solve4_vec(L_ref[j], Qu)
            p_new = (qx_ref[j] + _mtv(A, m, NX, NX)
                     + _mtv(K_ref[j], Qu, NU, NX))
            kff_all[pl.dslice(base + j, 1)] = kff[None]
            p_scr[:] = p_new

    @pl.when(n == ngrid)
    def _():
        dx_scr[:] = dx0_ref[:]

    @pl.when(n >= ngrid)
    def _forward_phase():
        base = (n - ngrid) * ns
        for j in range(ns):
            dx = dx_scr[:]
            kff = kff_all[pl.dslice(base + j, 1)][0]
            du = _mv(K_ref[j], dx, NU, NX) + kff
            dx_next = (_mv(A_ref[j], dx, NX, NX)
                       + _mv(B_ref[j], du, NX, NU) + c_ref[j])
            dx_out[j] = dx
            du_out[j] = du
            dx_scr[:] = dx_next


def corrector_sweep(A, B, c, qx, ru, K, L, Pc, p_term, dx0,
                    block_b: int = 128, stages_per_step: int = 1,
                    interpret: bool = False):
    """Fused vector backward pass + forward rollout (one launch).

    Same contract as backward_vector_sweep followed by forward_sweep with
    the resulting kff: returns (dx (N+1,13,·), du (N,4,·)).
    """
    N = A.shape[0]
    Btot = A.shape[-1]
    dtype = A.dtype
    ns = stages_per_step
    if N % ns != 0:
        raise ValueError(f"N={N} must be divisible by {ns}")
    nb = Btot // block_b
    ngrid = N // ns

    def mk_spec(shape_prefix, idx_of_n):
        def idx(b, n):
            return (idx_of_n(n),) + (0,) * len(shape_prefix) + (b,)
        return pl.BlockSpec((ns,) + shape_prefix + (block_b,), idx,
                            memory_space=pltpu.VMEM)

    both = lambda sp: mk_spec(
        sp, lambda n: jnp.where(n < ngrid, ngrid - 1 - n, n - ngrid))
    bwd = lambda sp: mk_spec(
        sp, lambda n: jnp.where(n < ngrid, ngrid - 1 - n, 0))
    fwd = lambda sp: mk_spec(
        sp, lambda n: jnp.where(n < ngrid, 0, n - ngrid))

    def spec_const(shape_prefix):
        def idx(b, n):
            return (0,) * len(shape_prefix) + (b,)
        return pl.BlockSpec(shape_prefix + (block_b,), idx,
                            memory_space=pltpu.VMEM)

    dxs, dus = pl.pallas_call(
        _ft.partial(_corrector_kernel, ns, ngrid),
        grid=(nb, 2 * ngrid),
        in_specs=[both((NX, NX)), both((NX, NU)), fwd((NX,)),
                  bwd((NX,)), bwd((NU,)), both((NU, NX)), bwd((NL,)),
                  bwd((NX,)), spec_const((NX,)), spec_const((NX,))],
        out_specs=(fwd((NX,)), fwd((NU,))),
        out_shape=(jax.ShapeDtypeStruct((N, NX, Btot), dtype),
                   jax.ShapeDtypeStruct((N, NU, Btot), dtype)),
        scratch_shapes=[pltpu.VMEM((NX, block_b), dtype),
                        pltpu.VMEM((N, NU, block_b), dtype),
                        pltpu.VMEM((NX, block_b), dtype)],
        interpret=interpret,
    )(A, B, c, qx, ru, K, L, Pc, p_term, dx0)
    dx_last = (jnp.einsum("ijb,jb->ib", A[-1], dxs[-1])
               + jnp.einsum("ijb,jb->ib", B[-1], dus[-1]) + c[-1])
    dx_all = jnp.concatenate([dxs, dx_last[None]], axis=0)
    return dx_all, dus


# ---------------------------------------------------------------------------
# vector-only backward sweep (reuses stored K, L, Pc)
# ---------------------------------------------------------------------------

def _backward_vec_kernel(ns, A_ref, B_ref, qx_ref, ru_ref, K_ref,
                         L_ref, Pc_ref, pt_ref, kff_out, p_scr):
    n = pl.program_id(1)

    @pl.when(n == 0)
    def _():
        p_scr[:] = pt_ref[:]

    for j in range(ns - 1, -1, -1):
        A = A_ref[j]
        Bm = B_ref[j]
        p = p_scr[:]
        m = p + Pc_ref[j]  # P_{k+1} c_k + p_{k+1}
        Qu = ru_ref[j] + _mtv(Bm, m, NX, NU)
        kff = -_cho_solve4_vec(L_ref[j], Qu)
        p_new = (qx_ref[j] + _mtv(A, m, NX, NX)
                 + _mtv(K_ref[j], Qu, NU, NX))
        kff_out[j] = kff
        p_scr[:] = p_new


def backward_vector_sweep(A, B, qx, ru, K, L, Pc, p_term,
                          block_b: int = 128, stages_per_step: int = 1,
                          interpret: bool = False):
    """Affine backward pass with a fixed factorization.

    Pc must be the stage-stacked P_{k+1} c_k array (N,13,·) emitted by
    `backward_sweep` — the only projection of the cost-to-go Hessian the
    second RHS needs.  Returns kff (N,4,·).
    """
    N = A.shape[0]
    Btot = A.shape[-1]
    dtype = A.dtype
    nb = Btot // block_b
    ns = stages_per_step
    if N % ns != 0:
        raise ValueError(f"N={N} must be divisible by {ns}")
    ngrid = N // ns

    def spec(shape_prefix):
        def idx(b, n):
            return (ngrid - 1 - n,) + (0,) * len(shape_prefix) + (b,)
        return pl.BlockSpec((ns,) + shape_prefix + (block_b,), idx,
                            memory_space=pltpu.VMEM)

    def spec_const(shape_prefix):
        def idx(b, n):
            return (0,) * len(shape_prefix) + (b,)
        return pl.BlockSpec(shape_prefix + (block_b,), idx,
                            memory_space=pltpu.VMEM)

    return pl.pallas_call(
        _ft.partial(_backward_vec_kernel, ns),
        grid=(nb, ngrid),
        in_specs=[spec((NX, NX)), spec((NX, NU)),
                  spec((NX,)), spec((NU,)), spec((NU, NX)), spec((NL,)),
                  spec((NX,)), spec_const((NX,))],
        out_specs=spec((NU,)),
        out_shape=jax.ShapeDtypeStruct((N, NU, Btot), dtype),
        scratch_shapes=[pltpu.VMEM((NX, block_b), dtype)],
        interpret=interpret,
    )(A, B, qx, ru, K, L, Pc, p_term)
