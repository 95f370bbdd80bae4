"""Fused Pallas kernels for the PARTIALLY CONDENSED multistage QP (block 2).

This is the TPU-native form of the reference's QP backend choice: acados
generates `PARTIAL_CONDENSING_HPIPM` (generate_c_code.py:140) — condense
groups of shooting intervals into one stage with a stacked input, then run
the structure-exploiting IPM on the shorter horizon.  Condensing N=50
stages into M=25 pairs

  * halves the sequential Riccati depth (half the P-carry dependency
    chain on the Pallas grid), and
  * cuts the factorization MACs per original stage ~28% (one dense
    13x13 P-recursion amortizes over two stages; the input dimension
    grows to 8, where the 8x8 Cholesky is still trace-time unrolled),

which is why HPIPM does it on CPUs and why it pays on the VPU: the
diagonal-cost backward sweep measures ~77% of vector-unit peak, so the
remaining speed comes from doing fewer FLOPs, not from better scheduling.

Exactness: block-2 condensing is an EXACT reparametrization — interior
states x_{2k+1} are eliminated through their dynamics row, bounds live on
the (unchanged, re-stacked) inputs, so the condensed QP's KKT solution
maps 1:1 onto the original (tests pin this against `ops.ipm`).

The condensed stage cost is no longer diagonal: Q' = Q0 + A0' Q1 A0 is
dense, there is a state-input cross term S' = [A0' Q1 B0, 0], and the
input Hessian gains a dense 4x4 block R00 = B0' Q1 B0.  The sweep kernels
here implement the general cross-term Riccati recursion
(Qux = S'^T + B'^T P A'), which the diagonal-cost kernels in
`riccati_kernels.py` do not need.

Layout contract matches riccati_kernels.py: batch-LAST (stage, n, m, B),
B rides the VPU lanes.
"""

from __future__ import annotations

import functools as _ft

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from crazyflie_nmpc_tpu.ops.pallas.riccati_kernels import (
    NU,
    NX,
    _add_diag,
    _mm,
    _mtm,
    _mtv,
    _mv,
)

NUC = 2 * NU                    # condensed (stacked) input dimension
NLC = NUC * (NUC + 1) // 2      # packed Cholesky entries for 8x8


# ---------------------------------------------------------------------------
# generic packed Cholesky (column-major lower packing, entries are (B,) lanes)
# ---------------------------------------------------------------------------

def _pk(i, j, n):
    """Packed index of L[i, j] (i >= j), column-major lower."""
    return j * n - j * (j - 1) // 2 + (i - j)


def _chol_n(M, n):
    """Unrolled n x n Cholesky of (n, n, B) -> packed lower (n(n+1)/2, B)."""
    L = [None] * (n * (n + 1) // 2)
    for j in range(n):
        s = M[j, j]
        for t in range(j):
            s = s - L[_pk(j, t, n)] * L[_pk(j, t, n)]
        ljj = jnp.sqrt(s)
        L[_pk(j, j, n)] = ljj
        inv = 1.0 / ljj
        for i in range(j + 1, n):
            s = M[i, j]
            for t in range(j):
                s = s - L[_pk(i, t, n)] * L[_pk(j, t, n)]
            L[_pk(i, j, n)] = s * inv
    return jnp.stack(L)


def _cho_solve_n(L, Y, n, m):
    """Solve (L L^T) X = Y, packed L (n(n+1)/2, B), Y (n, m, B)."""
    z = [None] * n
    for i in range(n):
        s = Y[i]
        for t in range(i):
            s = s - L[_pk(i, t, n)][None, :] * z[t]
        z[i] = s / L[_pk(i, i, n)][None, :]
    x = [None] * n
    for i in range(n - 1, -1, -1):
        s = z[i]
        for t in range(i + 1, n):
            s = s - L[_pk(t, i, n)][None, :] * x[t]
        x[i] = s / L[_pk(i, i, n)][None, :]
    return jnp.stack(x)


def _cho_solve_n_vec(L, y, n):
    """Solve (L L^T) x = y, packed L, y (n, B)."""
    z = [None] * n
    for i in range(n):
        s = y[i]
        for t in range(i):
            s = s - L[_pk(i, t, n)] * z[t]
        z[i] = s / L[_pk(i, i, n)]
    x = [None] * n
    for i in range(n - 1, -1, -1):
        s = z[i]
        for t in range(i + 1, n):
            s = s - L[_pk(t, i, n)] * x[t]
        x[i] = s / L[_pk(i, i, n)]
    return jnp.stack(x)


# ---------------------------------------------------------------------------
# block-2 condensing (embarrassingly parallel over pairs)
# ---------------------------------------------------------------------------

def _condense2_kernel(ms, A_ref, B_ref, c_ref, qxx_ref, qx_ref, ru_ref,
                      Ab_out, Bb_out, cb_out, Qb_out, S1T_out, R00_out,
                      qb_out, rb_out):
    for j in range(ms):
        A0 = A_ref[2 * j]          # x_{2k}   -> x_{2k+1}
        A1 = A_ref[2 * j + 1]      # x_{2k+1} -> x_{2k+2}
        B0 = B_ref[2 * j]
        B1 = B_ref[2 * j + 1]
        c0 = c_ref[2 * j]
        c1 = c_ref[2 * j + 1]
        q1 = qxx_ref[2 * j + 1]    # eliminated state's cost diagonal

        # condensed dynamics
        Ab_out[j] = _mm(A1, A0, NX, NX, NX)
        Bb_out[j] = jnp.concatenate(
            [_mm(A1, B0, NX, NX, NU), B1], axis=1)
        cb_out[j] = _mv(A1, c0, NX, NX) + c1

        # condensed cost: eliminate x1 = A0 x + B0 u0 + c0 through the
        # diagonal stage cost q1 (exact; cf. ops/condensing.py)
        qA = q1[:, None, :] * A0                      # diag(q1) A0
        qB = q1[:, None, :] * B0
        Qb_out[j] = _add_diag(_mtm(A0, qA, NX, NX, NX),
                              qxx_ref[2 * j], NX)
        S1T_out[j] = _mtm(B0, qA, NX, NU, NX)         # (4,13) = B0' q1 A0
        R00_out[j] = _mtm(B0, qB, NX, NU, NU)
        h = q1 * c0 + qx_ref[2 * j + 1]
        qb_out[j] = qx_ref[2 * j] + _mtv(A0, h, NX, NX)
        rb_out[j] = jnp.concatenate(
            [ru_ref[2 * j] + _mtv(B0, h, NX, NU), ru_ref[2 * j + 1]],
            axis=0)


def condense2(A, B, c, qxx, qx, ru, block_b: int = 128,
              stages_per_step: int = 5, interpret: bool = False):
    """Condense stage pairs: (N-stage diagonal-cost QP data) -> M = N/2
    stage dense-cost data.  All arrays batch-last.

    Returns dict with Abar (M,13,13,·), Bbar (M,13,8,·), cbar (M,13,·),
    Qbar (M,13,13,·), S1T (M,4,13,·) [S̄^T's nonzero half], R00 (M,4,4,·),
    qbar (M,13,·), rbar (M,8,·).
    """
    N, _, Btot = c.shape
    if N % 2 != 0:
        raise ValueError("block-2 condensing needs even N")
    M = N // 2
    ms = stages_per_step
    while M % ms != 0:
        ms -= 1
    nb = Btot // block_b
    dtype = c.dtype
    ngrid = M // ms

    def spec_in(sp):
        def idx(b, n):
            return (n,) + (0,) * len(sp) + (b,)
        return pl.BlockSpec((2 * ms,) + sp + (block_b,), idx,
                            memory_space=pltpu.VMEM)

    def spec_out(sp):
        def idx(b, n):
            return (n,) + (0,) * len(sp) + (b,)
        return pl.BlockSpec((ms,) + sp + (block_b,), idx,
                            memory_space=pltpu.VMEM)

    out_shape = (
        jax.ShapeDtypeStruct((M, NX, NX, Btot), dtype),
        jax.ShapeDtypeStruct((M, NX, NUC, Btot), dtype),
        jax.ShapeDtypeStruct((M, NX, Btot), dtype),
        jax.ShapeDtypeStruct((M, NX, NX, Btot), dtype),
        jax.ShapeDtypeStruct((M, NU, NX, Btot), dtype),
        jax.ShapeDtypeStruct((M, NU, NU, Btot), dtype),
        jax.ShapeDtypeStruct((M, NX, Btot), dtype),
        jax.ShapeDtypeStruct((M, NUC, Btot), dtype),
    )
    outs = pl.pallas_call(
        _ft.partial(_condense2_kernel, ms),
        grid=(nb, ngrid),
        in_specs=[spec_in((NX, NX)), spec_in((NX, NU)), spec_in((NX,)),
                  spec_in((NX,)), spec_in((NX,)), spec_in((NU,))],
        out_specs=(spec_out((NX, NX)), spec_out((NX, NUC)),
                   spec_out((NX,)), spec_out((NX, NX)),
                   spec_out((NU, NX)), spec_out((NU, NU)),
                   spec_out((NX,)), spec_out((NUC,))),
        out_shape=out_shape,
        interpret=interpret,
    )(A, B, c, qxx, qx, ru)
    keys = ("Abar", "Bbar", "cbar", "Qbar", "S1T", "R00", "qbar", "rbar")
    return dict(zip(keys, outs))


# ---------------------------------------------------------------------------
# interior-state expansion (embarrassingly parallel over pairs)
# ---------------------------------------------------------------------------

def _expand2_kernel(ms, A_ref, B_ref, c_ref, dxe_ref, du_ref, dxo_out):
    # A/B/c blocks cover both stages of each pair (2ms); only the even
    # (first-of-pair) rows drive the eliminated state's dynamics row
    for j in range(ms):
        dxo_out[j] = (_mv(A_ref[2 * j], dxe_ref[j], NX, NX)
                      + _mv(B_ref[2 * j], du_ref[j], NX, NU)
                      + c_ref[2 * j])


def expand2(A, B, c, dx_even, du0, block_b: int = 128,
            stages_per_step: int = 5, interpret: bool = False):
    """Recover the eliminated odd states through their dynamics row:
    dx_odd[k] = A[2k] dx_even[k] + B[2k] du0[k] + c[2k].

    A/B/c are the ORIGINAL (N-stage, batch-last) data; dx_even (M,13,·) and
    du0 (M,4,·) the condensed solution's states and first-of-pair inputs.
    One VPU launch replaces the XLA batched-einsum path (which runs tiny
    per-lane matvecs at a fraction of the bandwidth bound).
    """
    N, _, Btot = c.shape
    M = N // 2
    ms = stages_per_step
    while M % ms != 0:
        ms -= 1
    nb = Btot // block_b
    ngrid = M // ms

    def spec_in(sp, pair_rows):
        rows = 2 * ms if pair_rows else ms

        def idx(b, n):
            return (n,) + (0,) * len(sp) + (b,)
        return pl.BlockSpec((rows,) + sp + (block_b,), idx,
                            memory_space=pltpu.VMEM)

    dxo = pl.pallas_call(
        _ft.partial(_expand2_kernel, ms),
        grid=(nb, ngrid),
        in_specs=[spec_in((NX, NX), True), spec_in((NX, NU), True),
                  spec_in((NX,), True), spec_in((NX,), False),
                  spec_in((NU,), False)],
        out_specs=spec_in((NX,), False),
        out_shape=jax.ShapeDtypeStruct((M, NX, Btot), c.dtype),
        interpret=interpret,
    )(A, B, c, dx_even, du0)
    return dxo


# ---------------------------------------------------------------------------
# fused KKT sweep on the condensed problem (dense cost + cross term)
# ---------------------------------------------------------------------------

def _kkt_c2_kernel(ms, ngrid, A_ref, B_ref, c_ref, Q_ref, S1T_ref, R00_ref,
                   qx_ref, ruu_ref, ru_ref, Pt_ref, pt_ref, dx0_ref,
                   K_out, kff_out, L_out, Pc_out, dx_out, du_out, dxT_out,
                   P_scr, p_scr, K_all, kff_all, dx_scr):
    n = pl.program_id(1)

    @pl.when(n == 0)
    def _():
        eye = jnp.eye(NX, dtype=Pt_ref.dtype)[:, :, None]
        P_scr[:] = eye * Pt_ref[:][None, :, :]
        p_scr[:] = pt_ref[:]

    @pl.when(n < ngrid)
    def _backward_phase():
        base = (ngrid - 1 - n) * ms
        for j in range(ms - 1, -1, -1):
            A = A_ref[j]
            Bm = B_ref[j]
            c = c_ref[j]
            P = P_scr[:]
            p = p_scr[:]

            PA = _mm(P, A, NX, NX, NX)
            PB = _mm(P, Bm, NX, NX, NUC)
            Pc = _mv(P, c, NX, NX)
            m = p + Pc

            # Quu = R̄ + B̄'PB̄ + diag(ruu_shift); R̄'s dense block is the
            # top-left 4x4 (R00), rest of R̄ is in the ruu_shift diagonal
            BtPB = _mtm(Bm, PB, NX, NUC, NUC)
            z44 = jnp.zeros_like(R00_ref[j])
            R00p = jnp.concatenate([
                jnp.concatenate([R00_ref[j], z44], axis=1),
                jnp.concatenate([z44, z44], axis=1)], axis=0)
            Quu = _add_diag(BtPB + R00p, ruu_ref[j], NUC)

            # Qux = S̄' + B̄'PA with S̄' = [S1T; 0]
            S1T = S1T_ref[j]
            SxT = jnp.concatenate([S1T, jnp.zeros_like(S1T)], axis=0)
            Qux = SxT + _mtm(Bm, PA, NX, NUC, NX)
            Qu = ru_ref[j] + _mtv(Bm, m, NX, NUC)

            L = _chol_n(Quu, NUC)
            K = -_cho_solve_n(L, Qux, NUC, NX)
            kff = -_cho_solve_n_vec(L, Qu, NUC)

            APA = _mtm(A, PA, NX, NX, NX)
            QK = _mtm(Qux, K, NUC, NX, NX)
            P_new = Q_ref[j] + APA + QK
            P_new = 0.5 * (P_new + jnp.swapaxes(P_new, 0, 1))
            p_new = qx_ref[j] + _mtv(A, m, NX, NX) + _mtv(K, Qu, NUC, NX)

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
        base = (n - ngrid) * ms
        for j in range(ms):
            dx = dx_scr[:]
            K = K_all[pl.dslice(base + j, 1)][0]
            kff = kff_all[pl.dslice(base + j, 1)][0]
            du = _mv(K, dx, NUC, NX) + kff
            dx_next = (_mv(A_ref[j], dx, NX, NX)
                       + _mv(B_ref[j], du, NX, NUC) + c_ref[j])
            dx_out[j] = dx
            du_out[j] = du
            dx_scr[:] = dx_next
        # the final grid step leaves the TERMINAL state here (last write
        # wins) — emitting it from the kernel removes an XLA per-lane
        # matvec + concat tail per launch
        dxT_out[:] = dx_scr[:]


def kkt_sweep_c2(Abar, Bbar, cbar, Qbar, S1T, R00, qx, ruu_shift, ru,
                 pT_dense_diag, p_term, dx0, block_b: int = 128,
                 stages_per_step: int = 5, interpret: bool = False):
    """Fused dense-cost Riccati factorization + forward rollout over the
    condensed horizon.  qx/ru are the current (residual) linear terms;
    ruu_shift (M,8,·) is the diagonal part of R̄ incl. the IPM barrier
    shift.  Returns (K (M,8,13,·), kff, L (M,36,·), Pc (M,13,·),
    dx (M+1,13,·), du (M,8,·))."""
    M = Abar.shape[0]
    Btot = Abar.shape[-1]
    dtype = Abar.dtype
    ms = stages_per_step
    while M % ms != 0:
        ms -= 1
    nb = Btot // block_b
    ngrid = M // ms

    def mk_spec(sp, idx_of_n):
        def idx(b, n):
            return (idx_of_n(n),) + (0,) * len(sp) + (b,)
        return pl.BlockSpec((ms,) + sp + (block_b,), idx,
                            memory_space=pltpu.VMEM)

    both = lambda sp: mk_spec(
        sp, lambda n: jnp.where(n < ngrid, ngrid - 1 - n, n - ngrid))
    bwd = lambda sp: mk_spec(
        sp, lambda n: jnp.where(n < ngrid, ngrid - 1 - n, 0))
    fwd = lambda sp: mk_spec(
        sp, lambda n: jnp.where(n < ngrid, 0, n - ngrid))

    def spec_const(sp):
        def idx(b, n):
            return (0,) * len(sp) + (b,)
        return pl.BlockSpec(sp + (block_b,), idx, memory_space=pltpu.VMEM)

    out_shape = (
        jax.ShapeDtypeStruct((M, NUC, NX, Btot), dtype),
        jax.ShapeDtypeStruct((M, NUC, Btot), dtype),
        jax.ShapeDtypeStruct((M, NLC, Btot), dtype),
        jax.ShapeDtypeStruct((M, NX, Btot), dtype),
        jax.ShapeDtypeStruct((M, NX, Btot), dtype),
        jax.ShapeDtypeStruct((M, NUC, Btot), dtype),
        jax.ShapeDtypeStruct((NX, Btot), dtype),
    )
    out_specs = (bwd((NUC, NX)), bwd((NUC,)), bwd((NLC,)), bwd((NX,)),
                 fwd((NX,)), fwd((NUC,)), spec_const((NX,)))
    in_specs = [
        both((NX, NX)), both((NX, NUC)), both((NX,)),
        bwd((NX, NX)), bwd((NU, NX)), bwd((NU, NU)),
        bwd((NX,)), bwd((NUC,)), bwd((NUC,)),
        spec_const((NX,)), spec_const((NX,)), spec_const((NX,)),
    ]
    scratch = [
        pltpu.VMEM((NX, NX, block_b), dtype),
        pltpu.VMEM((NX, block_b), dtype),
        pltpu.VMEM((M, NUC, NX, block_b), dtype),
        pltpu.VMEM((M, NUC, block_b), dtype),
        pltpu.VMEM((NX, block_b), dtype),
    ]
    K, kff, L, Pc, dxs, dus, dxT = pl.pallas_call(
        _ft.partial(_kkt_c2_kernel, ms, ngrid),
        grid=(nb, 2 * ngrid),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=scratch,
        interpret=interpret,
    )(Abar, Bbar, cbar, Qbar, S1T, R00, qx, ruu_shift, ru,
      pT_dense_diag, p_term, dx0)
    dx_all = jnp.concatenate([dxs, dxT[None]], axis=0)
    return K, kff, L, Pc, dx_all, dus


# ---------------------------------------------------------------------------
# fused corrector sweep on the condensed problem
# ---------------------------------------------------------------------------

def _corr_c2_kernel(ms, ngrid, A_ref, B_ref, c_ref, qx_ref, ru_ref,
                    K_ref, L_ref, Pc_ref, pt_ref, dx0_ref,
                    dx_out, du_out, dxT_out, p_scr, kff_all, dx_scr):
    n = pl.program_id(1)

    @pl.when(n == 0)
    def _():
        p_scr[:] = pt_ref[:]

    @pl.when(n < ngrid)
    def _backward_phase():
        base = (ngrid - 1 - n) * ms
        for j in range(ms - 1, -1, -1):
            A = A_ref[j]
            Bm = B_ref[j]
            p = p_scr[:]
            m = p + Pc_ref[j]
            Qu = ru_ref[j] + _mtv(Bm, m, NX, NUC)
            kff = -_cho_solve_n_vec(L_ref[j], Qu, NUC)
            p_new = (qx_ref[j] + _mtv(A, m, NX, NX)
                     + _mtv(K_ref[j], Qu, NUC, NX))
            kff_all[pl.dslice(base + j, 1)] = kff[None]
            p_scr[:] = p_new

    @pl.when(n == ngrid)
    def _():
        dx_scr[:] = dx0_ref[:]

    @pl.when(n >= ngrid)
    def _forward_phase():
        base = (n - ngrid) * ms
        for j in range(ms):
            dx = dx_scr[:]
            kff = kff_all[pl.dslice(base + j, 1)][0]
            du = _mv(K_ref[j], dx, NUC, NX) + kff
            dx_next = (_mv(A_ref[j], dx, NX, NX)
                       + _mv(B_ref[j], du, NX, NUC) + c_ref[j])
            dx_out[j] = dx
            du_out[j] = du
            dx_scr[:] = dx_next
        # terminal state (last grid step's write wins) — see _kkt_c2_kernel
        dxT_out[:] = dx_scr[:]


def corrector_sweep_c2(Abar, Bbar, cbar, qx, ru, K, L, Pc, p_term, dx0,
                       block_b: int = 128, stages_per_step: int = 5,
                       interpret: bool = False):
    """Vector backward pass + forward rollout with the stored condensed
    factorization.  Returns (dx (M+1,13,·), du (M,8,·))."""
    M = Abar.shape[0]
    Btot = Abar.shape[-1]
    dtype = Abar.dtype
    ms = stages_per_step
    while M % ms != 0:
        ms -= 1
    nb = Btot // block_b
    ngrid = M // ms

    def mk_spec(sp, idx_of_n):
        def idx(b, n):
            return (idx_of_n(n),) + (0,) * len(sp) + (b,)
        return pl.BlockSpec((ms,) + sp + (block_b,), idx,
                            memory_space=pltpu.VMEM)

    both = lambda sp: mk_spec(
        sp, lambda n: jnp.where(n < ngrid, ngrid - 1 - n, n - ngrid))
    bwd = lambda sp: mk_spec(
        sp, lambda n: jnp.where(n < ngrid, ngrid - 1 - n, 0))
    fwd = lambda sp: mk_spec(
        sp, lambda n: jnp.where(n < ngrid, 0, n - ngrid))

    def spec_const(sp):
        def idx(b, n):
            return (0,) * len(sp) + (b,)
        return pl.BlockSpec(sp + (block_b,), idx, memory_space=pltpu.VMEM)

    dxs, dus, dxT = pl.pallas_call(
        _ft.partial(_corr_c2_kernel, ms, ngrid),
        grid=(nb, 2 * ngrid),
        in_specs=[both((NX, NX)), both((NX, NUC)), fwd((NX,)),
                  bwd((NX,)), bwd((NUC,)), both((NUC, NX)), bwd((NLC,)),
                  bwd((NX,)), spec_const((NX,)), spec_const((NX,))],
        out_specs=(fwd((NX,)), fwd((NUC,)), spec_const((NX,))),
        out_shape=(jax.ShapeDtypeStruct((M, NX, Btot), dtype),
                   jax.ShapeDtypeStruct((M, NUC, Btot), dtype),
                   jax.ShapeDtypeStruct((NX, Btot), dtype)),
        scratch_shapes=[pltpu.VMEM((NX, block_b), dtype),
                        pltpu.VMEM((M, NUC, block_b), dtype),
                        pltpu.VMEM((NX, block_b), dtype)],
        interpret=interpret,
    )(Abar, Bbar, cbar, qx, ru, K, L, Pc, p_term, dx0)
    dx_all = jnp.concatenate([dxs, dxT[None]], axis=0)
    return dx_all, dus
