"""Block-tridiagonal (RCM-banded) direct preconditioner — the TPU-native
answer to the reference's MUMPS direct solve at scale
(reference: src/vasp/simulations/offset_stenosis.py:44 `linear_solver="mumps"`).

Why this shape: the Ruiz-equilibrated FSI Jacobian under RCM ordering is
banded (bandwidth ~ two cross-sections of the vessel, e.g. 5.2k at 185k
dofs). Partitioning the RCM order into blocks of size c = bandwidth makes
the matrix EXACTLY block-tridiagonal, so a block-Thomas LU

    S_1 = D_1,   S_k = D_k - C_k S_{k-1}^{-1} B_{k-1}

is a direct factorization whose compute is entirely batched dense matmuls
and f32 inversions — pure MXU work. Stored as explicit inverses
(Sinv f32, H = Sinv C and G = Sinv B in bf16), the solve

    w_k = Sinv_k r_k - H_k w_{k-1}      (forward scan)
    x_k = w_k - G_k x_{k+1}             (backward scan)

is matmuls only: no sparse triangular solves (which do not map to TPU).
Everything — banded assembly from element Jacobians, factorization, apply —
runs on device; a rebuild ships NO matrix data over the host link.

Contrast with the dense-RAS path (fem/ras.py): RAS with graph overlap
needs S*m^2 >= 4.6e9 f32 elements at 185k dofs (does not fit 16 GiB HBM),
and overlap-free variants diverge on the saddle-point system (measured).
The banded factorization stores ~nb*c^2*(4+2+2) bytes ~= 8 GiB at the same
size and is an exact inverse of the frozen Jacobian, so GMRES converges in
a handful of iterations.
"""
from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np


@dataclass
class BandedPattern:
    """Static ordering data (depends on mesh/dofmap only)."""

    perm: np.ndarray  # (ndof,) permuted position q holds original dof perm[q]
    iperm: np.ndarray  # (ndof,) original dof i sits at permuted position
    c: int  # block size == RCM bandwidth (padded)
    nb: int  # number of blocks
    ndof: int

    @property
    def npad(self):
        return self.nb * self.c


def _fiedler_order(adj, ndof, seed=0):
    """Spectral (Fiedler-vector) ordering via LOBPCG with a Jacobi
    preconditioner. Measured on the 185k-dof bench graph (round 4): the
    sorted Fiedler order puts 99.9% of couplings within distance 3053 vs
    RCM's 4410 — RCM chases the worst PAIR (bandwidth 4483 vs spectral
    4151), but the spectral order has a far tighter coupling-distance
    distribution, which is what a QUANTILE-clipped band wants."""
    from scipy.sparse.linalg import lobpcg

    import scipy.sparse as sp

    deg = np.asarray(adj.sum(axis=1)).ravel()
    L = (sp.diags(deg) - adj).astype(np.float64)
    rng = np.random.default_rng(seed)
    X = rng.standard_normal((ndof, 3))
    X[:, 0] = 1.0
    Minv = sp.diags(1.0 / np.maximum(deg, 1.0))
    vals, vecs = lobpcg(L, X, M=Minv, tol=1e-5, maxiter=120,
                        largest=False)
    f = vecs[:, np.argsort(vals)[1]]
    return np.argsort(f, kind="stable")


def build_banded_pattern(block_dofs, ndof, lane_multiple=8, clip=None,
                         ordering=None, qclip=None):
    """Order the dof graph (RCM or spectral) and size blocks to its
    bandwidth.

    block_dofs: list of (K, nloc) global dof arrays (one per assembler
    block) — the graph is the union of their pairwise couplings.

    clip (or env VASP_BANDED_CLIP) in (0, 1]: size the blocks to
    clip*bandwidth instead of the full bandwidth. Couplings beyond the
    clipped band silently drop out of the PRECONDITIONER (assemble_banded
    discards out-of-band targets; the Krylov operator stays exact), which
    trades preconditioner quality for the O(c^2) factor memory/bandwidth.
    The RCM bandwidth of a vessel is set by the widest cross-section pair,
    so a modest clip drops only the few couplings that straddle it.

    ordering (or env VASP_BANDED_ORDER): "rcm" (default) | "spectral".
    qclip (or env VASP_BANDED_QCLIP) in (0, 1]: size c at the given
    QUANTILE of the coupling-distance distribution instead of its max —
    the natural companion of the spectral order (measured at 185k dofs:
    spectral + qclip 0.999 gives c 3053+pad vs RCM's 4488 while dropping
    only 0.1% of couplings; factor memory/apply traffic scale with c,
    factorization flops with c^2)."""
    import os

    import scipy.sparse as sp
    from scipy.sparse.csgraph import reverse_cuthill_mckee

    from vasp_tpu import native

    rows, cols = [], []
    for dofs in block_dofs:
        dofs = np.asarray(dofs)
        K, nloc = dofs.shape
        rows.append(np.repeat(dofs, nloc, axis=1).reshape(-1))
        cols.append(np.tile(dofs, (1, nloc)).reshape(-1))
    rows = np.concatenate(rows)
    cols = np.concatenate(cols)
    adj = sp.coo_matrix((np.ones(len(rows), np.float32), (rows, cols)),
                        shape=(ndof, ndof)).tocsr()
    adj = adj + adj.T
    if ordering is None:
        ordering = os.environ.get("VASP_BANDED_ORDER", "rcm")
    if ordering == "spectral":
        try:
            perm = _fiedler_order(adj, ndof)
        except Exception as exc:  # robustness: fall back to RCM
            print(f"banded: spectral ordering failed ({exc}); "
                  "falling back to RCM", flush=True)
            ordering = "rcm"
    if ordering != "spectral":
        perm = native.rcm_order(adj.indptr, adj.indices, ndof)
        if perm is None:
            perm = np.asarray(reverse_cuthill_mckee(adj,
                                                    symmetric_mode=True))
    perm = np.asarray(perm, np.int64)
    iperm = np.empty(ndof, np.int64)
    iperm[perm] = np.arange(ndof)
    # bandwidth of the permuted graph
    pr = iperm[rows]
    pc = iperm[cols]
    dist = np.abs(pr - pc)
    bw = int(dist.max())
    if clip is None:
        clip = float(os.environ.get("VASP_BANDED_CLIP", "1.0"))
    if qclip is None:
        qclip = float(os.environ.get("VASP_BANDED_QCLIP", "1.0"))
    c = max(1, bw if clip >= 1.0 else int(round(bw * clip)))
    if qclip < 1.0:
        c = min(c, max(1, int(np.quantile(dist, qclip))))
    c += (-c) % lane_multiple  # keep the lane dimension tidy
    if clip < 1.0 or qclip < 1.0:
        # the block-tridiagonal structure covers |pr-pc| <= c ALWAYS and
        # <= 2c-1 depending on position within the block; report the
        # guaranteed-dropped fraction so sweeps can correlate quality
        dropped = float((dist > c).sum()) / max(len(dist), 1)
        print(f"banded: order={ordering} clip={clip} qclip={qclip} c={c} "
              f"(bw={bw}) drops >={dropped:.2%} of couplings from the "
              "preconditioner", flush=True)
    nb = max(1, -(-ndof // c))
    return BandedPattern(perm=perm, iperm=iperm, c=c, nb=nb, ndof=ndof)


def identity_diag_slots(pattern: BandedPattern, bc_mask_np):
    """Host-precomputed flat indices (into the D storage) of the diagonal
    slots that get +1: bc dofs and padding rows."""
    c = pattern.c
    q = pattern.iperm[np.nonzero(np.asarray(bc_mask_np))[0]]
    q = np.concatenate([q, np.arange(pattern.ndof, pattern.npad)])
    return (q // c) * c * c + (q % c) * c + (q % c)


def build_banded_assembly_plan(block_dofs, pattern: BandedPattern,
                               bc_mask_np):
    """Host-precomputed scatter targets for assemble_banded.

    The banded targets depend only on STATIC data (dof tables, ordering,
    bc mask), but passing iperm/mask as device arrays made the jitted
    assembly recompute ~110M-entry index tensors and run THREE 110M-entry
    scatter-adds (two of which dump most entries) every rebuild — measured
    3.33 s of the 5.7 s rebuild at 185k dofs. This plan partitions the
    element entries by TARGET MATRIX once on the host: per block and per
    target t in (C, D, B), a static (src, dst) index pair — src gathers
    the in-band values out of the flattened element Jacobian, dst
    scatter-adds them into that matrix's (size,) buffer. Disjoint subsets,
    no dump traffic, int32-safe per buffer (3*size overflows int32 at
    bench scale, which ruled out one combined buffer).

    Returns list (per block) of 3 plan dicts: src/dst sorted BY DST on
    the host (static data), plus the unique-slot decomposition
    (udst, starts) enabling the cumsum segment-sum assembly — see
    assemble_banded_planned."""
    c, nb, ndof = pattern.c, pattern.nb, pattern.ndof
    size = nb * c * c
    assert size + 1 < 2 ** 31, "banded storage exceeds int32 indexing"
    iperm = pattern.iperm.astype(np.int64)
    mask = np.asarray(bc_mask_np, bool)
    plans = []
    for dofs in block_dofs:
        dofs = np.asarray(dofs)
        pi = iperm[dofs]  # (K, nloc)
        ok = ~mask[dofs]
        k = pi // c
        row = pi % c
        o = pi[:, None, :] - (k[:, :, None] - 1) * c
        t = o // c  # 0 = C, 1 = D, 2 = B
        oc = o % c
        flat = (k[:, :, None] * c + row[:, :, None]) * c + oc
        valid = ok[:, None, :] & ok[:, :, None]
        per_t = []
        tt = t.reshape(-1)
        vv = valid.reshape(-1)
        ff = flat.reshape(-1)
        for tsel in (0, 1, 2):
            src = np.nonzero(vv & (tt == tsel))[0]
            dst = ff[src]
            order = np.argsort(dst, kind="stable")
            src, dst = src[order], dst[order]
            udst, starts = np.unique(dst, return_index=True)
            per_t.append(dict(
                src=jnp.asarray(src.astype(np.int32)),
                dst=jnp.asarray(dst.astype(np.int32)),
                udst=jnp.asarray(udst.astype(np.int32)),
                starts=jnp.asarray(starts.astype(np.int32)),
            ))
        plans.append(per_t)
    return plans


def assemble_banded_planned(jacs, plans, pattern: BandedPattern,
                            diag_flat, mode=None):
    """Jitted assembly against a host-precomputed plan
    (build_banded_assembly_plan): per block and target matrix, one static
    gather + one accumulation over the in-band entries only.

    mode (or env VASP_ASM_MODE):
    - "scatter" (default): scatter-add over HOST-PRESORTED (src, dst) —
      the plan sorts by dst once, so XLA's scatter lowering skips its
      on-device sort (`indices_are_sorted=True`).
    - "cumsum": segment sums via an f64 prefix sum over the dst-sorted
      values, then one scatter-add with UNIQUE sorted indices. Measured
      SLOWER (1.99 vs 1.01 s at half bench size, values matching to
      1.5e-5 abs): the emulated-f64 prefix pass costs more than the
      sorted scatter saves — kept as the A/B reference. (An f32 prefix
      over 1e8 entries loses ~1e-3 absolute — not acceptable for the
      preconditioner matrix, hence f64 there.)"""
    import os

    if mode is None:
        mode = os.environ.get("VASP_ASM_MODE", "scatter")
    c, nb = pattern.c, pattern.nb
    size = nb * c * c
    bufs = [jnp.zeros(size, jnp.float32) for _ in range(3)]
    for A, per_t in zip(jacs, plans):
        v = A.astype(jnp.float32).reshape(-1)
        for tsel in range(3):
            p = per_t[tsel]
            sv = v[p["src"]]
            if mode == "cumsum":
                cs = jnp.concatenate(
                    [jnp.zeros(1, jnp.float64),
                     jnp.cumsum(sv.astype(jnp.float64))])
                n = np.int32(sv.shape[0])
                ends = jnp.concatenate(
                    [p["starts"][1:], jnp.full((1,), n, jnp.int32)])
                seg = (cs[ends] - cs[p["starts"]]).astype(jnp.float32)
                bufs[tsel] = bufs[tsel].at[p["udst"]].add(
                    seg, indices_are_sorted=True, unique_indices=True)
            else:
                bufs[tsel] = bufs[tsel].at[p["dst"]].add(
                    sv, indices_are_sorted=True)
    # identity rows: bc dofs + padding slots (host-precomputed, D matrix)
    bufs[1] = bufs[1].at[diag_flat].add(1.0)
    Cm = bufs[0].reshape(nb, c, c)
    D = bufs[1].reshape(nb, c, c)
    Bm = bufs[2].reshape(nb, c, c)
    return Cm, D, Bm


def assemble_banded(blocks, jacs, pattern: BandedPattern, bc_mask,
                    iperm_dev, diag_flat):
    """Scatter scaled element Jacobians into block-tridiagonal storage.

    Returns (C, D, B): D (nb,c,c) f32 diagonal blocks with identity on
    bc/padded rows; C couples block k to k-1, B to k+1 (bf16 — they enter
    the factorization through f32-accumulated matmuls, so bf16 rounding of
    the couplings only perturbs the preconditioner at ~0.4%).

    Pure jittable device code: the banded "matrix assembly" is one
    scatter-add per target — no host CSR, no host<->device matrix traffic.
    """
    c, nb, ndof = pattern.c, pattern.nb, pattern.ndof
    size = nb * c * c
    assert size < 2 ** 31, "banded storage exceeds int32 indexing"
    # ALL matrix data accumulates in f32: bf16 matrix values are a ~1e-2
    # perturbation that the ~1e6-1e9-conditioned Schur recursion amplifies
    # into a useless preconditioner (measured: rel residual 2e2). Only the
    # FACTORS (Sinv/H/G) tolerate bf16 — the Newton polish makes them
    # LU-consistent with the f32 matrix. Index math in int32.
    D = jnp.zeros(size + 1, jnp.float32)
    Cm = jnp.zeros(size + 1, jnp.float32)
    Bm = jnp.zeros(size + 1, jnp.float32)
    dump = np.int32(size)
    ip32 = iperm_dev.astype(jnp.int32)
    c32 = np.int32(c)

    for b, A in zip(blocks, jacs):
        dofs = b.dofs  # (K, nloc)
        pi = ip32[dofs]  # (K, nloc) permuted indices, i32
        ok = ~bc_mask[dofs]  # (K, nloc) non-bc
        k = pi // c32
        row = pi % c32
        # pairwise (K, nloc, nloc): row index from axis 1, col from axis 2
        o = pi[:, None, :] - (k[:, :, None] - 1) * c32  # col offset [0,3c)
        t = o // c32  # 0 = C, 1 = D, 2 = B
        oc = o % c32
        flat = (k[:, :, None] * c32 + row[:, :, None]) * c32 + oc
        valid = ok[:, None, :] & ok[:, :, None]
        vals = A.astype(jnp.float32)
        fD = jnp.where(valid & (t == 1), flat, dump).reshape(-1)
        fC = jnp.where(valid & (t == 0), flat, dump).reshape(-1)
        fB = jnp.where(valid & (t == 2), flat, dump).reshape(-1)
        v = vals.reshape(-1)
        D = D.at[fD].add(v)
        Cm = Cm.at[fC].add(v)
        Bm = Bm.at[fB].add(v)

    # identity rows: bc dofs + padding slots (host-precomputed)
    D = D.at[diag_flat].add(1.0)

    D = D[:size].reshape(nb, c, c)
    Cm = Cm[:size].reshape(nb, c, c)
    Bm = Bm[:size].reshape(nb, c, c)
    return Cm, D, Bm


def bgemv(A, x):
    """True-f32 VPU matvec, batched or single:
    y[..., a] = sum_b A[..., a, b] x[..., b].

    dot_general with a 1-wide RHS maps badly onto the MXU, and under the
    global jax_default_matmul_precision=highest every f32 dot pays THREE
    bf16 passes over A. The broadcast-multiply + reduce runs on the VPU in
    true f32 with one traffic pass: measured 3.11 -> 1.62 ms standalone at
    (20832, 64, 64) bench shape (scripts/diag_gemv.py), and it is what the
    banded applies' per-scan-step c x c matvecs want (A is the traffic)."""
    return jnp.sum(A * x[..., None, :], axis=-1)


def _probe_rel(Cm, D, Bm, Sinv, H, G):
    """Solve quality of the STORED factors against the banded operator:
    rel = ||T M b - b|| / ||b|| for a deterministic +-1 probe, where T is
    the block-tridiagonal matvec of (C, D, B) and M the two-scan apply.
    This is the metric that actually discriminates broken bf16 factors:
    measured ~1e-2 on structured tube meshes (which converge) vs ~48 on
    the reference's unstructured vmtk fixture (which stalls Newton),
    while the max-entry block-inverse error is 1e2-2e3 on BOTH. O(nb c^2)
    — one factor read, negligible next to the factorization."""
    nb, c, _ = D.shape
    b = jnp.where((jnp.arange(nb * c) % 2) == 0, 1.0, -1.0
                  ).astype(jnp.float32).reshape(nb, c)
    t = bgemv(Sinv, b)

    def fwd(wprev, tH):
        tk, Hk = tH
        wk = tk - bgemv(Hk, wprev)
        return wk, wk

    _, w = jax.lax.scan(fwd, jnp.zeros(c, jnp.float32), (t, H))

    def bwd(xnext, wG):
        wk, Gk = wG
        xk = wk - bgemv(Gk, xnext)
        return xk, xk

    _, x = jax.lax.scan(bwd, jnp.zeros(c, jnp.float32), (w, G),
                        reverse=True)
    y = bgemv(D, x)
    y = y.at[1:].add(bgemv(Cm[1:], x[:-1]))
    y = y.at[:-1].add(bgemv(Bm[:-1], x[1:]))
    return jnp.linalg.norm(y - b) / jnp.linalg.norm(b)


def default_inv_levels():
    """Blocked-inversion depth for the f32 Schur scans: env override
    VASP_BANDED_INVLEVELS, else 3 on accelerators and 0 (LU) on CPU —
    the host LAPACK LU is efficient and the blocked variant's extra
    matmul flops only cost time there (the multichip dryrun runs on
    virtual CPU devices; the TPU LU is the measured bottleneck,
    2.54 -> 1.61 s full-bench scan with levels=3)."""
    import os

    v = os.environ.get("VASP_BANDED_INVLEVELS")
    if v is not None:
        return int(v)
    return 3 if jax.default_backend() != "cpu" else 0


def _inv_blocked(S, levels):
    """f32 inverse via 2x2 recursive Schur splitting + 1 Newton polish —
    the MXU-friendly replacement for `jnp.linalg.inv + polish` inside the
    factorization scans (VERDICT r4 #4: the scan was bound by ~42
    sequential 4488^2 LU inversions the MXU idles through; measured
    standalone 43.5 -> 28 ms/block at c=4488, scripts/diag_blockinv.py).

    Unpivoted block elimination, so: max-equilibrate first (the same
    guard _inv64 uses — raw Schur blocks reach blockcond ~2e9 on
    unstructured meshes) and Newton-polish after; the production path's
    probe_rel + reactive escalation ladder covers the rest. |SX-I|_F
    matched the LU path to 3 digits on a cond~1e6 test block."""
    rs = 1.0 / jnp.maximum(jnp.max(jnp.abs(S), axis=1), 1e-30)
    Ss = S * rs[:, None]
    cs = 1.0 / jnp.maximum(jnp.max(jnp.abs(Ss), axis=0), 1e-30)
    Ss = Ss * cs[None, :]

    def rec(M, lv):
        n = M.shape[0]
        if lv == 0 or n % 2:
            return jnp.linalg.inv(M)
        h = n // 2
        A = M[:h, :h]
        B = M[:h, h:]
        C = M[h:, :h]
        D = M[h:, h:]
        Ai = rec(A, lv - 1)
        AiB = jnp.matmul(Ai, B, preferred_element_type=jnp.float32)
        Sc = D - jnp.matmul(C, AiB, preferred_element_type=jnp.float32)
        Sci = rec(Sc, lv - 1)
        CAi = jnp.matmul(C, Ai, preferred_element_type=jnp.float32)
        tr = -jnp.matmul(AiB, Sci, preferred_element_type=jnp.float32)
        bl = -jnp.matmul(Sci, CAi, preferred_element_type=jnp.float32)
        tl = Ai - jnp.matmul(AiB, bl, preferred_element_type=jnp.float32)
        return jnp.concatenate(
            [jnp.concatenate([tl, tr], axis=1),
             jnp.concatenate([bl, Sci], axis=1)], axis=0)

    X = rec(Ss, levels)
    n = S.shape[0]
    I2 = 2.0 * jnp.eye(n, dtype=jnp.float32)
    X = X @ (I2 - Ss @ X)
    return cs[:, None] * X * rs[None, :]


def factorize_banded(Cm, D, Bm, factor_dtype=jnp.float32, inv_levels=0):
    """Block-Thomas factorization, all-MXU.

    Two-phase for HBM headroom at 185k dofs (16 GiB chip): the scan
    consumes f32 (C, D, B), carries the exact f32 G_k for the Schur
    recursion, and emits Sinv in bf16 (one Newton polish X <- X(2I - S X)
    makes the f32 inverse LU-consistent before rounding); H = Sinv C and
    G = Sinv B follow as batched matmuls once D's block of HBM is free.
    Peak ~13.7 GB at 185k dofs; factors resident afterwards: ~6 GB.

    Also returns `rel`, the _probe_rel solve quality of the stored bf16
    factors — the caller escalates to factorize_banded_f64 (f32 storage)
    when rel exceeds ~1 (bf16 rounding of the factors collapses on the
    near-singular Schur chains of unstructured vmtk meshes, measured
    rel ~48 on the reference stenosis fixture; structured tubes sit at
    ~1e-2 and never escalate).

    factor_dtype: storage precision of the emitted Sinv/H/G. f32 is the
    default: the block-tridiagonal pattern covers the FULL RCM band, so
    f32 factors make the preconditioner an essentially exact solve and
    GMRES converges in 1 inner iteration vs 8 with bf16 at tol 1e-3
    (measured, 4k-cell bench tube; bf16 factor rounding is amplified by
    the Schur block conditioning into ~0.4/iteration contraction). bf16
    remains the choice where HBM is the binding constraint (the lowmem
    variant at 185k dofs).

    inv_levels > 0 selects the blocked Schur inversion (_inv_blocked) —
    the bad-factor probe below still gates the result either way."""
    nb, c, _ = D.shape
    eye2 = 2.0 * jnp.eye(c, dtype=jnp.float32)

    def step(Gprev, CDB):
        Ck, Dk, Bk = CDB
        CG = jnp.matmul(Ck, Gprev, preferred_element_type=jnp.float32)
        S = Dk - CG
        if inv_levels > 0:
            Si = _inv_blocked(S, inv_levels)
        else:
            Si = jnp.linalg.inv(S)
            Si = Si @ (eye2 - S @ Si)
        Gk = jnp.matmul(Si, Bk, preferred_element_type=jnp.float32)
        return Gk, Si.astype(factor_dtype)

    G0 = jnp.zeros((c, c), jnp.float32)
    _, Sinv = jax.lax.scan(step, G0, (Cm, D, Bm))
    H = jnp.einsum("kab,kbc->kac", Sinv, Cm,
                   preferred_element_type=jnp.float32).astype(factor_dtype)
    G = jnp.einsum("kab,kbc->kac", Sinv, Bm,
                   preferred_element_type=jnp.float32).astype(factor_dtype)
    return Sinv, H, G, _probe_rel(Cm, D, Bm, Sinv, H, G)


def factorize_banded_lowmem(Cm, D, Bm, factor_dtype=jnp.bfloat16,
                            inv_levels=0):
    """Schur scan emitting ONLY Sinv (bf16): at ~190k dofs (c=4488, nb=42)
    the H/G factors of factorize_banded push the rebuild peak to ~14 GB and
    the chip OOMs; keeping the raw C/B (already resident) and folding the
    H w = Sinv(C w) / G x = Sinv(B x) products into the apply halves the
    factor memory at the cost of one extra matmul per scan step.

    No quality probe here: lowmem-scale problems do not escalate (the
    emulated-f64 factorization at this size is a measured OOM), and the
    probe would extend D's lifetime past the scan, raising the peak this
    variant exists to lower.

    factor_dtype: Sinv storage. bf16 default — at lowmem scale HBM is the
    binding constraint (f32 Sinv adds ~1.7 GB on the ~13.7 GB rebuild
    peak); pass f32 where the chip has headroom for ~8x fewer GMRES
    iterations (see factorize_banded).

    inv_levels > 0: invert each Schur block with the 2x2 recursive
    blocked elimination (_inv_blocked, `inv_levels` splitting rounds)
    instead of the LU — MXU matmuls instead of the sequential panel
    factorization (VERDICT r4 #4)."""
    nb, c, _ = D.shape
    eye2 = 2.0 * jnp.eye(c, dtype=jnp.float32)

    def step(Gprev, CDB):
        Ck, Dk, Bk = CDB
        CG = jnp.matmul(Ck, Gprev, preferred_element_type=jnp.float32)
        S = Dk - CG
        if inv_levels > 0:
            Si = _inv_blocked(S, inv_levels)
        else:
            Si = jnp.linalg.inv(S)
            Si = Si @ (eye2 - S @ Si)
        Gk = jnp.matmul(Si, Bk, preferred_element_type=jnp.float32)
        return Gk, Si.astype(factor_dtype)

    G0 = jnp.zeros((c, c), jnp.float32)
    _, Sinv = jax.lax.scan(step, G0, (Cm, D, Bm))
    return Sinv


def _inv64(S, n_polish=3):
    """Inverse of one Schur block in emulated f64: row/col max-
    equilibrate (f64 diagonal scalings), f32-LU seed of the equilibrated
    block (TPU has f32 LU but no f64 LU/TriangularSolve), then matmul-only
    Newton polish X <- X(2I - S X) in f64 — each pass squares the error,
    so seed ~1e-1 (equilibrated blockcond ~1e5-1e6) reaches ~1e-8 in 3.

    The equilibration is what makes the seed usable: the RAW Schur blocks
    of the reference's unstructured vmtk fixture reach blockcond ~2e9
    (f32 inv error > 1 — Newton polish diverges)."""
    rs = 1.0 / jnp.maximum(jnp.max(jnp.abs(S), axis=1), 1e-300)
    Ss = S * rs[:, None]
    cs = 1.0 / jnp.maximum(jnp.max(jnp.abs(Ss), axis=0), 1e-300)
    Ss = Ss * cs[None, :]
    c = S.shape[0]
    I2 = 2.0 * jnp.eye(c, dtype=jnp.float64)
    X = jnp.linalg.inv(Ss.astype(jnp.float32)).astype(jnp.float64)
    for _ in range(n_polish):
        X = X @ (I2 - Ss @ X)
    return cs[:, None] * X * rs[None, :]


def factorize_banded_sinv32(Cm, D, Bm, inv_levels=0):
    """Schur scan emitting ONLY Sinv in f32 — phase 1 of the HYBRID lowmem
    factorization (f32 Sinv + bf16 H/G, see IterativeStepper).

    Why hybrid: at lowmem scale the bf16-everything factors cost ~5 GMRES
    inner iterations per direction (measured 0.245 s/direction at 185k
    dofs) while f32 factors converge in ~1-2 — but all-f32 Sinv+H+G does
    not fit the 16 GB chip (measured RESOURCE_EXHAUSTED, BENCH_FDTYPE=f32
    probe). The binding error is Sinv's bf16 ROUNDING (the lowmem bf16
    C/B switch was measured iteration-count neutral, so the recursion
    operators tolerate bf16) — keeping Sinv in f32 and the H/G recursion
    factors in bf16 gets f32-grade preconditioning at 6.8 GB of factors.
    The caller computes H/G as separate jitted phases with the f32 C/B
    donated, capping the rebuild peak.

    Computationally this IS factorize_banded_lowmem with f32 storage
    (one shared scan body — advisor r4); only the hybrid rationale above
    differs."""
    return factorize_banded_lowmem(Cm, D, Bm, factor_dtype=jnp.float32,
                                   inv_levels=inv_levels)


def factorize_banded_f64(Cm, D, Bm):
    """Escalation path: the Schur recursion in emulated f64, factors
    emitted in f32 (f32 STORAGE of exact factors gives apply rel ~5e-4 on
    the fixture — measured; it is the f32 RECURSION that fails there).
    ~10-20x the f32 factorization cost (emulated f64 matmuls), paid only
    when the f32 path's err diagnostic trips — i.e. on unstructured
    meshes with near-singular intermediate Schur complements."""
    nb, c, _ = D.shape

    def step(Gprev, CDB):
        Ck, Dk, Bk = CDB
        S = Dk.astype(jnp.float64) - Ck.astype(jnp.float64) @ Gprev
        Si = _inv64(S)
        Gk = Si @ Bk.astype(jnp.float64)
        return Gk, Si.astype(jnp.float32)

    G0 = jnp.zeros((c, c), jnp.float64)
    _, Sinv = jax.lax.scan(step, G0, (Cm, D, Bm))
    H = jnp.einsum("kab,kbc->kac", Sinv, Cm,
                   preferred_element_type=jnp.float32)
    G = jnp.einsum("kab,kbc->kac", Sinv, Bm,
                   preferred_element_type=jnp.float32)
    return Sinv, H, G


def factorize_banded_f64_lowmem(Cm, D, Bm):
    """f64-recursion variant of factorize_banded_lowmem (Sinv f32 only)."""
    nb, c, _ = D.shape

    def step(Gprev, CDB):
        Ck, Dk, Bk = CDB
        S = Dk.astype(jnp.float64) - Ck.astype(jnp.float64) @ Gprev
        Si = _inv64(S)
        Gk = Si @ Bk.astype(jnp.float64)
        return Gk, Si.astype(jnp.float32)

    G0 = jnp.zeros((c, c), jnp.float64)
    _, Sinv = jax.lax.scan(step, G0, (Cm, D, Bm))
    return Sinv


def make_banded_apply_lowmem(pattern: BandedPattern):
    """apply(Sinv, C, B, r) -> M r, algebraically identical to
    make_banded_apply with H = Sinv C and G = Sinv B folded in."""
    c, nb, ndof = pattern.c, pattern.nb, pattern.ndof
    perm = jnp.asarray(pattern.perm)
    npad = nb * c

    def apply(Sinv, Cm, Bm, r):
        rp = jnp.zeros(npad, jnp.float32)
        rp = rp.at[: ndof].set(r[perm].astype(jnp.float32))
        rb = rp.reshape(nb, c)

        def fwd(wprev, rCS):
            rk, Ck, Sk = rCS
            wk = bgemv(Sk, rk - bgemv(Ck, wprev))
            return wk, wk

        _, w = jax.lax.scan(fwd, jnp.zeros(c, jnp.float32),
                            (rb, Cm, Sinv))

        def bwd(xnext, wBS):
            wk, Bk, Sk = wBS
            xk = wk - bgemv(Sk, bgemv(Bk, xnext))
            return xk, xk

        _, x = jax.lax.scan(bwd, jnp.zeros(c, jnp.float32), (w, Bm, Sinv),
                            reverse=True)
        x = x.reshape(-1)[:ndof]
        out = jnp.zeros(ndof, r.dtype)
        return out.at[perm].set(x.astype(r.dtype))

    return apply


def make_banded_apply(pattern: BandedPattern):
    """Returns apply(Sinv, H, G, r) -> M r (same dtype as r).

    Two scans of single matvecs — HBM-bandwidth bound (~8 GB read per
    apply at full size, ~10 ms on v5e)."""
    c, nb, ndof = pattern.c, pattern.nb, pattern.ndof
    perm = jnp.asarray(pattern.perm)
    npad = nb * c

    def apply(Sinv, H, G, r):
        rp = jnp.zeros(npad, jnp.float32)
        rp = rp.at[: ndof].set(r[perm].astype(jnp.float32))
        rb = rp.reshape(nb, c)
        t = bgemv(Sinv, rb)

        def fwd(wprev, tH):
            tk, Hk = tH
            wk = tk - bgemv(Hk, wprev)
            return wk, wk

        _, w = jax.lax.scan(fwd, jnp.zeros(c, jnp.float32), (t, H))

        def bwd(xnext, wG):
            wk, Gk = wG
            xk = wk - bgemv(Gk, xnext)
            return xk, xk

        _, x = jax.lax.scan(bwd, jnp.zeros(c, jnp.float32), (w, G),
                            reverse=True)
        x = x.reshape(-1)[:ndof]
        out = jnp.zeros(ndof, r.dtype)
        return out.at[perm].set(x.astype(r.dtype))

    return apply
