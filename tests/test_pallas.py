"""Pallas fused-kernel tests (interpreter mode on CPU; the same kernel runs
natively on TPU — validated there by bench.py's accuracy gate and the
verify-skill drive)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hybrid_fem_lssvr_tpu import SolverConfig, problems
from hybrid_fem_lssvr_tpu.models import hybrid as H
from hybrid_fem_lssvr_tpu.ops import pallas_kernels as pk


@pytest.fixture(scope="module")
def setup():
    problem = problems.poisson_1d()
    E = 256
    cfg = SolverConfig(num_nodes=E + 1, dtype="float32")
    nodes = H.uniform_nodes(problem, cfg.num_nodes, jnp.float32)
    fem = jnp.sin(jnp.pi * nodes).astype(jnp.float32)
    shared = H.prepare_shared_host(problem, cfg)
    return problem, cfg, nodes, fem, shared


def test_fused_matches_jnp_path(setup):
    problem, cfg, nodes, fem, shared = setup
    E = nodes.shape[0] - 1
    w, slack, bcv = pk.fused_enhance_shared(
        fem, shared, problem.f, -1.0, 2.0 / E, cfg.n_colloc, tile=128,
        interpret=True,
    )
    wj, diags = H.lssvr_enhance(problem, nodes, fem, cfg, shared)
    np.testing.assert_allclose(np.asarray(w), np.asarray(wj), atol=2e-6)
    np.testing.assert_allclose(
        np.asarray(slack), np.asarray(diags.max_slack), atol=2e-5
    )
    np.testing.assert_allclose(
        np.asarray(bcv), np.asarray(diags.bc_violation), atol=2e-6
    )


def test_fused_no_diagnostics(setup):
    problem, cfg, nodes, fem, shared = setup
    E = nodes.shape[0] - 1
    w, slack, bcv = pk.fused_enhance_shared(
        fem, shared, problem.f, -1.0, 2.0 / E, cfg.n_colloc, tile=128,
        interpret=True, with_diagnostics=False,
    )
    assert slack is None and bcv is None
    w_full, _, _ = pk.fused_enhance_shared(
        fem, shared, problem.f, -1.0, 2.0 / E, cfg.n_colloc, tile=128,
        interpret=True,
    )
    np.testing.assert_array_equal(np.asarray(w), np.asarray(w_full))


def test_f_shifted_structured_rhs_matches_direct(setup):
    """The angle-addition structured rhs (Problem1D.f_shifted) equals the
    direct f(xl + d) evaluation inside the fused kernel."""
    problem, cfg, nodes, fem, shared = setup
    E = nodes.shape[0] - 1
    w_direct, _, _ = pk.fused_enhance_shared(
        fem, shared, problem.f, -1.0, 2.0 / E, cfg.n_colloc, tile=128,
        interpret=True,
    )
    w_struct, _, _ = pk.fused_enhance_shared(
        fem, shared, problem.f, -1.0, 2.0 / E, cfg.n_colloc, tile=128,
        interpret=True, f_shifted_fn=problem.f_shifted,
    )
    np.testing.assert_allclose(np.asarray(w_struct), np.asarray(w_direct),
                               atol=1e-6)


def test_fused_2d_matches_xla_path():
    from hybrid_fem_lssvr_tpu.models import hybrid2d as h2
    from hybrid_fem_lssvr_tpu.ops import kkt

    p = h2.poisson_2d()
    cfg = h2.Solver2DConfig(nx=16, ny=16, M=5, n_colloc=5, dtype="float32")
    shared, (t_int, bpts) = h2.prepare_shared_2d(p, cfg)
    xs = jnp.linspace(-1, 1, 17, dtype=jnp.float32)
    ys = jnp.linspace(-1, 1, 17, dtype=jnp.float32)
    fem, _ = h2.fem_solve_2d(p, cfg, xs, ys)
    f_rows, bc_rows, _ = h2._element_data_2d(p, cfg, xs, ys, fem, t_int,
                                             bpts)
    w_ref, d_ref = kkt.solve_primal_shared(shared, f_rows, bc_rows)
    geom = (-1.0, 2 / 16, -1.0, 2 / 16)
    for fs in (None, p.f_shifted):
        w, slack, bcv = pk.fused_enhance_shared_2d(
            fem, shared, p.f, p.g, geom, 16, 16, t_int, bpts, tile=256,
            interpret=True, f_shifted_fn=fs,
        )
        np.testing.assert_allclose(np.asarray(w), np.asarray(w_ref),
                                   atol=1e-5)
        np.testing.assert_allclose(
            np.asarray(bcv), np.asarray(d_ref.bc_violation), atol=1e-5
        )


def test_fused_separable_matches_generic(setup):
    """The separable-rhs kernel (host-f64 contracted factors, no [C, tile]
    rhs materialisation) matches the generic fused kernel's coefficients
    and bc violation; its slack uses exact algebra so it must agree with
    the f64 oracle residual rather than the f32 cancellation noise."""
    problem, cfg, nodes, fem, shared = setup
    E = nodes.shape[0] - 1
    w_gen, slack_gen, bcv_gen = pk.fused_enhance_shared(
        fem, shared, problem.f, -1.0, 2.0 / E, cfg.n_colloc, tile=128,
        interpret=True,
    )
    w_sep, slack_sep, bcv_sep = pk.fused_enhance_separable(
        fem, shared, problem.f_elem_factors, -1.0, 2.0 / E, tile=128,
        interpret=True,
    )
    np.testing.assert_allclose(np.asarray(w_sep), np.asarray(w_gen),
                               atol=2e-6)
    np.testing.assert_allclose(np.asarray(bcv_sep), np.asarray(bcv_gen),
                               atol=2e-6)
    # Translation mode (one base transcendental per tile + static mixing)
    # must agree with per-element factor evaluation.
    w_tr, slack_tr, bcv_tr = pk.fused_enhance_separable(
        fem, shared, problem.f_elem_factors, -1.0, 2.0 / E, tile=128,
        interpret=True, f_translation=problem.f_translation,
    )
    np.testing.assert_allclose(np.asarray(w_tr), np.asarray(w_sep),
                               atol=2e-6)
    np.testing.assert_allclose(np.asarray(slack_tr), np.asarray(slack_sep),
                               rtol=1e-3, atol=1e-11)
    # f64 oracle: apply the EXACT affine map in float64 and take its
    # residual — the separable kernel's slack reports the optimum's
    # algebraic residual (host-f64 operators), free of the generic path's
    # f - D w cancellation noise (~1e-6 |f| in f32).
    import dataclasses

    import numpy as onp

    cfg64 = dataclasses.replace(cfg, dtype="float64")
    sh64 = H.prepare_shared_host(problem, cfg64)
    Wf64, Wbc64, D64 = (onp.asarray(a, onp.float64)
                        for a in (sh64.Wf, sh64.Wbc, sh64.D))
    h = 2.0 / E
    t = onp.linspace(-1, 1, cfg.n_colloc)
    xl = -1.0 + onp.arange(E)[:, None] * h
    xq = xl + (t[None, :] + 1.0) * 0.5 * h
    f64 = onp.pi**2 * onp.sin(onp.pi * xq)
    fv = onp.asarray(fem, onp.float64)
    bc64 = onp.stack([fv[:-1], fv[1:]], axis=1)
    w64 = f64 @ Wf64.T + bc64 @ Wbc64.T
    slack_oracle = onp.max(onp.abs(f64 - w64 @ D64.T), axis=1)
    np.testing.assert_allclose(np.asarray(slack_sep), slack_oracle,
                               rtol=5e-2, atol=1e-12)
    # ...and it is far below the generic f32 path's cancellation floor.
    assert float(np.max(np.asarray(slack_sep))) < \
        0.1 * float(np.max(np.asarray(slack_gen)))


def test_fused_varcoeff_matches_xla_lse_path():
    """The fused variable-coefficient CGS2-QR kernel equals the XLA
    null-space LSE path (same algebra, VMEM-resident) on both the direct
    and structured-rhs evaluations."""
    problem = problems.variable_coeff_elliptic()
    E = 256
    cfg = SolverConfig(num_nodes=E + 1, dtype="float32", M=8, n_colloc=12)
    nodes = H.uniform_nodes(problem, cfg.num_nodes, jnp.float32)
    fem = jnp.sin(jnp.pi * nodes).astype(jnp.float32)
    h = 2.0 / E
    host = pk.VarCoeffOperators(cfg.M, cfg.n_colloc, h, jnp.float32)
    wj, diags = H.lssvr_enhance(problem, nodes, fem, cfg)
    for fs in (None, problem.f_shifted):
        w, slack, bcv, cond = pk.fused_enhance_varcoeff(
            fem, problem, host, -1.0, h, cfg.n_colloc, tile=128,
            interpret=True, f_shifted_fn=fs,
        )
        np.testing.assert_allclose(np.asarray(w), np.asarray(wj), atol=3e-5)
        # In-kernel condition monitor == the XLA path's R-diagonal ratio
        # (both are max|R_jj|/min|R_jj| of the same CGS2 factorisation; the
        # ratio is invariant to the paths' different global row scalings).
        np.testing.assert_allclose(np.asarray(cond),
                                   np.asarray(diags.cond_estimate),
                                   rtol=1e-3)
        # Slack is ill-conditioned across paths at fine h: max|f - D w|
        # amplifies f32 w-noise by ||D|| ~ (2/h)^2 (~2 absolute here), so
        # each f32 path reports its own rounding realisation.  Assert the
        # aggregate magnitude agrees instead of per-element values.
        ratio = float(jnp.max(slack)) / float(jnp.max(diags.max_slack))
        assert 0.2 < ratio < 5.0, ratio
        assert float(jnp.max(bcv)) < 1e-5


def test_fused_varcoeff_advection_matches_xla():
    """Nonsymmetric collocation rows (b != 0) through the fused kernel."""
    problem = problems.advection_diffusion_1d()
    E = 128
    cfg = SolverConfig(num_nodes=E + 1, dtype="float32", M=6, n_colloc=10)
    nodes = H.uniform_nodes(problem, cfg.num_nodes, jnp.float32)
    fem = jnp.sin(jnp.pi * nodes).astype(jnp.float32)
    h = 2.0 / E
    host = pk.VarCoeffOperators(cfg.M, cfg.n_colloc, h, jnp.float32)
    # Force the non-shared XLA path by passing shared_ops=None.
    wj, _ = H.lssvr_enhance(problem, nodes, fem, cfg, shared_ops=None)
    w, _, bcv, _ = pk.fused_enhance_varcoeff(
        fem, problem, host, -1.0, h, cfg.n_colloc, tile=128, interpret=True,
    )
    np.testing.assert_allclose(np.asarray(w), np.asarray(wj), atol=3e-5)


def test_pick_tile():
    assert pk.pick_tile(1 << 20) == 8192
    assert pk.pick_tile(3 * 256) == 256
    assert pk.pick_tile(100) == 0  # not 128-aligned -> XLA fallback
    assert pk.pick_tile(24) == 0


def test_tile_validation(setup):
    problem, cfg, nodes, fem, shared = setup
    with pytest.raises(ValueError, match="not a multiple"):
        pk.fused_enhance_shared(fem, shared, problem.f, -1.0, 2.0 / 256,
                                cfg.n_colloc, tile=100 * 128)
    with pytest.raises(ValueError, match="128 lanes"):
        pk.fused_enhance_shared(fem[:65], shared, problem.f, -1.0,
                                2.0 / 64, cfg.n_colloc, tile=64)


def test_backend_routing():
    """cfg.backend='auto' stays on XLA off-TPU; explicit 'xla' always works
    and produces the solution through the facade."""
    cfg = SolverConfig(num_nodes=129, dtype="float32", backend="xla")
    s = H.HybridSolver(problems.poisson_1d(), cfg)
    s.solve()
    linf, _ = s.errors(np.linspace(-1, 1, 101))
    assert float(linf) < 1e-4
    assert H._resolve_backend(cfg, 128) == "xla"
    auto = SolverConfig(num_nodes=129, dtype="float32")
    expected = "pallas" if jax.default_backend() == "tpu" else "xla"
    assert H._resolve_backend(auto, 128) == expected


def test_fused_stacked_2d_matches_xla_path():
    """The 2D stacked-operator kernel ([w; e] in one MXU dot, exact-algebra
    slack) equals the XLA shared path on both homogeneous and
    inhomogeneous (g-override) problems, with and without structured rhs."""
    from hybrid_fem_lssvr_tpu.models import hybrid2d as h2
    from hybrid_fem_lssvr_tpu.ops import kkt

    for p in (h2.poisson_2d(), h2.poisson_2d_inhomogeneous()):
        cfg = h2.Solver2DConfig(nx=16, ny=16, M=5, n_colloc=5,
                                dtype="float32")
        shared, (t_int, bpts) = h2.prepare_shared_2d(p, cfg)
        assert shared.Pres is not None
        xs = jnp.linspace(-1, 1, 17, dtype=jnp.float32)
        ys = jnp.linspace(-1, 1, 17, dtype=jnp.float32)
        fem, _ = h2.fem_solve_2d(p, cfg, xs, ys)
        f_rows, bc_rows, _ = h2._element_data_2d(p, cfg, xs, ys, fem,
                                                 t_int, bpts)
        w_ref, d_ref = kkt.solve_primal_shared(shared, f_rows, bc_rows)
        geom = (-1.0, 2 / 16, -1.0, 2 / 16)
        for fs in (None, p.f_shifted):
            w, slack, bcv = pk.fused_enhance_stacked_2d(
                fem, shared, p.f, p.g, geom, 16, 16, t_int, bpts,
                tile=256, interpret=True, f_shifted_fn=fs,
            )
            np.testing.assert_allclose(np.asarray(w), np.asarray(w_ref),
                                       atol=2e-5)
            np.testing.assert_allclose(
                np.asarray(bcv), np.asarray(d_ref.bc_violation), atol=1e-5
            )
            # slack is the exact-algebra residual — same order as XLA's
            r = float(jnp.max(slack)) / max(
                float(jnp.max(d_ref.max_slack)), 1e-30)
            assert 0.05 < r < 20.0, r


def test_fused_stacked_3d_matches_xla_path():
    """The 3D stacked-operator kernel (trilinear trace + face g-override +
    one [M^3+C^3, C^3+S] MXU dot) equals the XLA shared path on both
    homogeneous and inhomogeneous 3D Poisson."""
    from hybrid_fem_lssvr_tpu.models import hybrid3d as h3
    from hybrid_fem_lssvr_tpu.ops import kkt

    for p in (h3.poisson_3d(), h3.poisson_3d_inhomogeneous()):
        cfg = h3.Solver3DConfig(nx=4, ny=4, nz=8, M=4, n_colloc=4,
                                dtype="float32", precond="jacobi")
        shared, (t_int, spts) = h3.prepare_shared_3d(p, cfg)
        assert shared.Pres is not None
        xs = jnp.linspace(-1, 1, 5, dtype=jnp.float32)
        zs = jnp.linspace(-1, 1, 9, dtype=jnp.float32)
        fem, _ = h3.fem_solve_3d(p, cfg, xs, xs, zs)
        f_rows, bc_rows, _ = h3._element_data_3d(p, cfg, xs, xs, zs, fem,
                                                 t_int, spts)
        w_ref, d_ref = kkt.solve_primal_shared(shared, f_rows, bc_rows)
        geom = (-1.0, 2 / 4, -1.0, 2 / 4, -1.0, 2 / 8)
        for fs in (None, p.f_shifted):
            w, slack, bcv = pk.fused_enhance_stacked_3d(
                fem, shared, p.f, p.g, geom, 4, 4, 8, t_int, spts,
                tile=128, interpret=True, f_shifted_fn=fs,
            )
            np.testing.assert_allclose(np.asarray(w), np.asarray(w_ref),
                                       atol=2e-5)
            np.testing.assert_allclose(
                np.asarray(bcv), np.asarray(d_ref.bc_violation), atol=1e-5
            )
            r = float(jnp.max(slack)) / max(
                float(jnp.max(d_ref.max_slack)), 1e-30)
            assert 0.05 < r < 20.0, r


def test_fused_varcoeff_2d_matches_xla_path():
    """The fused 2D per-element-operator kernel (coefficient sampling +
    projected-column CGS2 QR in VMEM) equals the XLA batched null-space
    path on variable_coeff_elliptic_2d, with direct and structured rhs."""
    from hybrid_fem_lssvr_tpu.models import hybrid2d as h2
    from hybrid_fem_lssvr_tpu.ops import kkt

    p = h2.variable_coeff_elliptic_2d()
    cfg = h2.Solver2DConfig(nx=16, ny=16, M=5, n_colloc=5, dtype="float32")
    vops, (t_int, bpts) = h2.prepare_shared_2d(p, cfg)
    assert vops.AZ is not None and vops.AP is not None
    xs = jnp.linspace(-1, 1, 17, dtype=jnp.float32)
    ys = jnp.linspace(-1, 1, 17, dtype=jnp.float32)
    fem, _ = h2.fem_solve_2d(p, cfg, xs, ys)
    f_rows, bc_rows, _ = h2._element_data_2d(p, cfg, xs, ys, fem,
                                             t_int, bpts)
    D = h2._varcoeff_element_operators(p, cfg, xs, ys, vops, t_int)
    w_ref, d_ref = kkt.solve_batched(D, vops.B, f_rows, bc_rows, cfg.gamma,
                                     ZP=(vops.Z, vops.Pbc))
    geom = (-1.0, 2 / 16, -1.0, 2 / 16)
    s2 = 2.0 * 16.0 ** 2  # sx^2 + sy^2 at hx = hy = 1/8
    cases = [("qr", None), ("qr", p.f_shifted), ("sne", p.f_shifted)]
    for method, fs in cases:
        w, slack, bcv = pk.fused_enhance_varcoeff_2d(
            fem, vops, p.a_var, p.grad_a, p.f, p.g, geom, 16, 16,
            t_int, bpts, s2=s2, tile=256, interpret=True, f_shifted_fn=fs,
            method=method,
        )
        np.testing.assert_allclose(np.asarray(w), np.asarray(w_ref),
                                   atol=3e-5)
        np.testing.assert_allclose(
            np.asarray(bcv), np.asarray(d_ref.bc_violation), atol=1e-5
        )
        # Same scaled-residual algebra -> the slack realisations agree
        # closely (static 1/s2 scale here vs per-element RMS there; the
        # 'sne' residual is post-refinement, same magnitude).
        r = float(jnp.max(slack)) / max(
            float(jnp.max(d_ref.max_slack)), 1e-30)
        assert 0.2 < r < 5.0, (method, r)


def test_fused_varcoeff_graded_mesh_matches_xla():
    """Graded-mesh mode (traced node positions, chain factors folded into
    the coefficients) equals the XLA per-element LSE path on a random
    non-uniform mesh — this is the fused kernel behind
    hybrid_solve_general / adaptive refinement on TPU."""
    problem = problems.variable_coeff_elliptic()
    E = 128
    rng = np.random.default_rng(4)
    widths = rng.uniform(0.5, 2.0, E)
    nodes = np.concatenate([[0.0], np.cumsum(widths)])
    nodes = -1.0 + 2.0 * nodes / nodes[-1]  # graded mesh on [-1, 1]
    nodes = jnp.asarray(nodes, jnp.float32)
    cfg = SolverConfig(num_nodes=E + 1, dtype="float32", M=8, n_colloc=12)
    fem = jnp.sin(jnp.pi * nodes).astype(jnp.float32)
    wj, _ = H.lssvr_enhance(problem, nodes, fem, cfg, shared_ops=None)
    h_ref = 2.0 / E
    host = pk.VarCoeffOperators(cfg.M, cfg.n_colloc, h_ref, jnp.float32)
    w, slack, bcv, _ = pk.fused_enhance_varcoeff(
        fem, problem, host, -1.0, h_ref, cfg.n_colloc, tile=128,
        interpret=True, nodes=nodes,
    )
    np.testing.assert_allclose(np.asarray(w), np.asarray(wj), atol=5e-5)
    assert float(jnp.max(bcv)) < 1e-5
    # Constant-coefficient problem on the same graded mesh (the other
    # hybrid_solve_general client).
    problem2 = problems.poisson_1d()
    wj2, _ = H.lssvr_enhance(problem2, nodes, fem, cfg, shared_ops=None)
    w2, _, bcv2, _ = pk.fused_enhance_varcoeff(
        fem, problem2, host, -1.0, h_ref, cfg.n_colloc, tile=128,
        interpret=True, nodes=nodes,
    )
    np.testing.assert_allclose(np.asarray(w2), np.asarray(wj2), atol=5e-5)


def test_fused_graded_2d_matches_xla_path():
    """The graded-mesh fused kernel (per-element chain factors from row
    inputs, five unit-scale reference blocks, dynamic per-element row
    scale) equals the XLA graded path on uniform AND random graded
    meshes, constant and variable coefficients."""
    from hybrid_fem_lssvr_tpu.models import hybrid2d as h2
    from hybrid_fem_lssvr_tpu.models import hybrid2d_graded as hg
    from hybrid_fem_lssvr_tpu.ops import kkt

    rng = np.random.default_rng(3)
    for pname in ("advection_diffusion_2d", "variable_coeff_elliptic_2d"):
        p = h2.get_problem_2d(pname)
        cfg = h2.Solver2DConfig(nx=16, ny=16, M=5, n_colloc=5,
                                precond="jacobi", dtype="float32")
        gops, (t_int, bpts) = hg.prepare_shared_2d_graded(p, cfg)
        xs = np.sort(np.concatenate([[-1, 1],
                                     rng.uniform(-0.95, 0.95, 15)]))
        ys = np.sort(np.concatenate([[-1, 1],
                                     rng.uniform(-0.95, 0.95, 15)]))
        xsj = jnp.asarray(xs, jnp.float32)
        ysj = jnp.asarray(ys, jnp.float32)
        fem, _ = hg.fem_solve_2d_graded(p, cfg, xsj, ysj)
        f_rows, bc_rows, _ = h2._element_data_2d(p, cfg, xsj, ysj, fem,
                                                 t_int, bpts)
        D = hg._graded_element_operators(p, cfg, xsj, ysj, gops, t_int)
        w_ref, d_ref = kkt.solve_batched(D, gops.B, f_rows, bc_rows,
                                         cfg.gamma,
                                         ZP=(gops.Z, gops.Pbc))
        w, slack, bcv = pk.fused_enhance_graded_2d(
            fem, gops, p, xsj, ysj, 16, 16, t_int, bpts, tile=256,
            interpret=True)
        np.testing.assert_allclose(np.asarray(w), np.asarray(w_ref),
                                   atol=3e-5)
        np.testing.assert_allclose(
            np.asarray(bcv), np.asarray(d_ref.bc_violation), atol=1e-5)
        r = float(jnp.max(slack)) / max(
            float(jnp.max(d_ref.max_slack)), 1e-30)
        assert 0.2 < r < 5.0, (pname, r)


def test_fused_elastic_matches_xla_path():
    """The fused VECTOR kernel (round-5: the XLA elastic enhancement
    measured ~13% of bandwidth SOL at 512^2) == the XLA block-LSE route
    in interpret mode: coefficients, slack, bc violation."""
    from hybrid_fem_lssvr_tpu.models import elastic as EL

    problem = EL.get_elastic_problem("sin_elastic_2d")
    cfg = EL.ElasticConfig2D(nx=16, ny=16, M=4, n_colloc=4,
                             dtype="float32", backend="xla")
    shared, (t_int, bpts) = EL.prepare_shared_elastic(problem, cfg)
    xs = jnp.linspace(-1, 1, 17, dtype=jnp.float32)
    u1 = jnp.sin(jnp.pi * xs)[None, :] * jnp.sin(jnp.pi * xs)[:, None]
    u2 = jnp.sin(jnp.pi * xs)[None, :] * jnp.sin(2 * jnp.pi * xs)[:, None]
    fem = jnp.stack([u1, u2]).astype(jnp.float32)
    # XLA reference
    coeffs_x, diags_x, _ = EL.enhance_elastic(
        problem, cfg, xs, xs, fem, (shared, (t_int, bpts)))
    # kernel in interpret mode
    w, slack, bcv = pk.fused_enhance_elastic_2d(
        fem, shared, (problem.f1, problem.f2),
        (problem.g1, problem.g2), (-1.0, 2.0 / 16, -1.0, 2.0 / 16),
        16, 16, t_int, bpts, tile=256, interpret=True,
    )
    M = cfg.M
    coeffs_k = jnp.stack([
        w.reshape(-1, 2, M, M)[:, c].reshape(16, 16, M, M)
        for c in range(2)
    ])
    np.testing.assert_allclose(np.asarray(coeffs_k),
                               np.asarray(coeffs_x), atol=3e-5)
    np.testing.assert_allclose(np.asarray(slack).reshape(16, 16),
                               np.asarray(diags_x.max_slack
                                          ).reshape(16, 16), rtol=5e-4,
                               atol=2e-4)
    np.testing.assert_allclose(np.asarray(bcv).reshape(16, 16),
                               np.asarray(diags_x.bc_violation
                                          ).reshape(16, 16), rtol=5e-4,
                               atol=2e-5)
