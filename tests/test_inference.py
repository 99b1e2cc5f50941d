"""Inference engines: NUTS/HMC statistical correctness on known targets,
window adaptation, diagnostics, optimisation loops, SMC evidence."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

import stheno_tpu as st
from stheno_tpu import params as P
from stheno_tpu.inference import (
    run_nuts,
    run_smc,
    fit,
    fit_lbfgs,
    effective_sample_size,
    potential_scale_reduction,
)


def test_nuts_standard_normal(key):
    """NUTS recovers a 5-D standard normal."""
    d = 5

    def logp(q):
        return -0.5 * jnp.sum(q**2)

    samples, info = run_nuts(
        key, logp, jnp.zeros(d), num_warmup=400, num_samples=800, num_chains=4
    )
    s = np.asarray(samples).reshape(-1, d)
    assert s.shape == (3200, d)
    np.testing.assert_allclose(s.mean(0), np.zeros(d), atol=0.1)
    np.testing.assert_allclose(s.std(0), np.ones(d), atol=0.1)
    assert np.asarray(info.diverging).mean() < 0.01
    # adaptation hit the target acceptance ballpark
    acc = np.asarray(info.accept_prob).mean()
    assert 0.6 < acc <= 1.0


def test_nuts_correlated_gaussian(key):
    """Anisotropic + correlated target: exercises mass adaptation and
    U-turn machinery."""
    cov = np.array([[4.0, 1.8], [1.8, 1.0]])
    prec = jnp.asarray(np.linalg.inv(cov))

    def logp(q):
        return -0.5 * q @ prec @ q

    samples, info = run_nuts(
        key, logp, jnp.zeros(2), num_warmup=500, num_samples=1000, num_chains=4
    )
    s = np.asarray(samples).reshape(-1, 2)
    emp = np.cov(s.T)
    np.testing.assert_allclose(emp, cov, rtol=0.15, atol=0.1)
    rhat = potential_scale_reduction(np.asarray(samples)[..., 0])
    assert float(rhat) < 1.02


def test_nuts_pytree_positions(key):
    """Pytree positions round-trip through ravel."""

    def logp(q):
        return -0.5 * jnp.sum(q["a"] ** 2) - 0.5 * jnp.sum((q["b"] - 1.0) ** 2)

    init = dict(a=jnp.zeros(2), b=jnp.zeros(3))
    samples, _ = run_nuts(
        key, logp, init, num_warmup=300, num_samples=500, num_chains=2
    )
    assert samples["a"].shape == (2, 500, 2)
    np.testing.assert_allclose(
        np.asarray(samples["b"]).mean((0, 1)), np.ones(3), atol=0.15
    )


def test_hmc_kernel_standard_normal(key):
    def logp(q):
        return -0.5 * jnp.sum(q**2)

    samples, info = run_nuts(
        key,
        logp,
        jnp.zeros(3),
        num_warmup=300,
        num_samples=800,
        num_chains=4,
        kernel="hmc",
        num_hmc_steps=16,
    )
    s = np.asarray(samples).reshape(-1, 3)
    np.testing.assert_allclose(s.mean(0), np.zeros(3), atol=0.12)
    np.testing.assert_allclose(s.std(0), np.ones(3), atol=0.12)


def test_diagnostics_iid(key):
    """ESS of iid samples ≈ C*S; R-hat ≈ 1."""
    x = jax.random.normal(key, (4, 1000))
    ess = effective_sample_size(x)
    assert float(ess) > 2000
    rhat = potential_scale_reduction(x)
    np.testing.assert_allclose(float(rhat), 1.0, atol=0.02)
    # strongly autocorrelated chains → low ESS
    ar = np.zeros((4, 1000))
    noise = np.asarray(jax.random.normal(key, (4, 1000)))
    for t in range(1, 1000):
        ar[:, t] = 0.99 * ar[:, t - 1] + 0.1 * noise[:, t]
    ess_ar = effective_sample_size(jnp.asarray(ar))
    assert float(ess_ar) < 500


def test_params_roundtrip():
    spec = dict(
        v=P.positive(2.0),
        l=P.positive(0.5, lb=1e-3),
        w=P.bounded(0.3, 0.0, 1.0),
        m=jnp.asarray([1.0, -1.0]),
        z=P.fixed(jnp.linspace(0, 1, 4)),
    )
    theta0, unflatten = P.init(spec)
    vals = unflatten(theta0)
    np.testing.assert_allclose(vals["v"], 2.0, rtol=1e-6)
    np.testing.assert_allclose(vals["l"], 0.5, rtol=1e-6)
    np.testing.assert_allclose(vals["w"], 0.3, rtol=1e-6)
    np.testing.assert_allclose(vals["m"], [1.0, -1.0])
    np.testing.assert_allclose(vals["z"], np.linspace(0, 1, 4))
    # fixed leaves are not in theta
    assert theta0.shape == (5,)  # v, l, w, m(2)
    # constrained stay in range when theta moves
    vals2 = unflatten(theta0 - 100.0)
    assert vals2["v"] > 0 and vals2["l"] >= 1e-3 and 0 < vals2["w"] < 1


def test_fit_recovers_hyperparameters(rng, key):
    """Adam fit of nlml recovers known kernel hyperparameters (the
    getting_started workload pattern)."""
    x = jnp.asarray(np.sort(rng.uniform(-5, 5, 120)))
    true_v, true_l, true_noise = 2.0, 1.5, 0.1
    k_true = true_v * st.with_lengthscale(st.SEKernel(), true_l)
    from stheno_tpu.graph import GPC
    gpc = GPC()
    f_true = st.GP(k_true, gpc=gpc)
    y = st.rand(key, f_true(x, true_noise))

    @st.gppp
    def build(p):
        return dict(f=st.GP(p["v"] * st.with_lengthscale(st.SEKernel(), p["l"])))

    def nlml(p):
        f = build(p)
        return -st.logpdf(f(st.GPPPInput("f", x), p["noise"]), y)

    spec = dict(v=P.positive(1.0), l=P.positive(1.0), noise=P.positive(0.5))
    res = fit(nlml, spec, num_steps=400, learning_rate=5e-2)
    assert res.losses[-1] < res.losses[0]
    # loose recovery bounds (single realisation)
    assert 0.5 < float(res.params["l"]) < 4.0
    assert float(res.params["noise"]) < 0.5


def test_fit_lbfgs_quadratic():
    target = jnp.asarray([1.0, -2.0, 3.0])

    def obj(p):
        return jnp.sum((p["x"] - target) ** 2)

    res = fit_lbfgs(obj, dict(x=jnp.zeros(3)), num_steps=50)
    np.testing.assert_allclose(res.params["x"], target, atol=1e-6)


def test_smc_gaussian_evidence(key):
    """SMC on conjugate Gaussian: evidence and posterior moments known in
    closed form.  Prior N(0,1), likelihood N(y=1 | q, 1) per dim."""
    d = 2
    y = 1.0

    def loglike(q):
        return -0.5 * jnp.sum((q - y) ** 2) - 0.5 * d * jnp.log(2 * jnp.pi)

    def logprior(q):
        return -0.5 * jnp.sum(q**2) - 0.5 * d * jnp.log(2 * jnp.pi)

    P_ = 2000
    init = jax.random.normal(key, (P_, d))
    res = run_smc(
        jax.random.PRNGKey(3), loglike, logprior, init, num_mcmc=5,
        hmc_step_size=0.5, hmc_num_steps=8,
    )
    # posterior = N(y/2, 1/2); evidence = N(y; 0, 2) per dim
    log_Z = d * (-0.5 * np.log(2 * np.pi * 2) - y**2 / 4)
    assert float(res.particles.std()) > 0.1  # particles not collapsed
    np.testing.assert_allclose(res.particles.mean(0), [0.5, 0.5], atol=0.1)
    np.testing.assert_allclose(
        res.particles.std(0), np.sqrt(0.5) * np.ones(2), atol=0.1
    )
    np.testing.assert_allclose(float(res.log_evidence), log_Z, atol=0.15)
    assert int(res.num_stages) >= 1
    assert float(res.beta_history[int(res.num_stages) - 1]) == 1.0


def test_nuts_checkpoint_resume(key, tmp_path):
    """Segmented sampling with checkpoint/restore across 'restarts'
    (SURVEY.md §5 checkpoint/resume)."""
    from stheno_tpu.inference import (
        ChainState,
        load_checkpoint,
        run_nuts,
        save_checkpoint,
    )

    def logp(q):
        return -0.5 * jnp.sum(q**2)

    s1, i1, state = run_nuts(
        key, logp, jnp.zeros(3), num_warmup=200, num_samples=200,
        num_chains=2, return_state=True,
    )
    assert state.q.shape == (2, 3) and state.eps.shape == (2,)

    path = str(tmp_path / "ckpt")
    save_checkpoint(path, state, step=200)
    restored = load_checkpoint(path, state)
    np.testing.assert_array_equal(np.asarray(restored.q), np.asarray(state.q))

    # resume: no warmup, continues from the restored state
    s2, i2 = run_nuts(
        jax.random.PRNGKey(9), logp, jnp.zeros(3), num_samples=300,
        num_chains=2, resume_state=ChainState(*map(jnp.asarray, restored)),
    )
    assert s2.shape == (2, 300, 3)
    # combined samples still have the right moments
    alls = np.concatenate([np.asarray(s1), np.asarray(s2)], axis=1).reshape(-1, 3)
    np.testing.assert_allclose(alls.mean(0), np.zeros(3), atol=0.15)
    np.testing.assert_allclose(alls.std(0), np.ones(3), atol=0.15)


def test_nuts_resume_equals_uninterrupted(key, tmp_path):
    """warmup → checkpoint → resume reproduces the uninterrupted run
    bit-for-bit given the same top-level key (VERDICT r1 item 8)."""
    from stheno_tpu.inference import (
        ChainState,
        load_checkpoint,
        run_nuts,
        save_checkpoint,
    )

    def logp(q):
        return -0.5 * jnp.sum(q**2)

    S1, S2 = 60, 40
    full, _ = run_nuts(
        key, logp, jnp.zeros(3), num_warmup=100, num_samples=S1 + S2,
        num_chains=2,
    )
    seg1, _, state = run_nuts(
        key, logp, jnp.zeros(3), num_warmup=100, num_samples=S1,
        num_chains=2, return_state=True,
    )
    path = str(tmp_path / "ckpt_eq")
    save_checkpoint(path, state, step=S1)
    restored = load_checkpoint(path, state)
    seg2, _ = run_nuts(
        key, logp, jnp.zeros(3), num_samples=S2, num_chains=2,
        resume_state=ChainState(*map(jnp.asarray, restored)),
        sample_offset=S1,
    )
    np.testing.assert_array_equal(np.asarray(seg1), np.asarray(full)[:, :S1])
    np.testing.assert_array_equal(np.asarray(seg2), np.asarray(full)[:, S1:])


def test_checkpoint_rejects_structure_mismatch(tmp_path):
    """Same arity, different treedef → load must raise, not scramble leaves."""
    from stheno_tpu.inference import load_checkpoint, save_checkpoint

    tree = {"a": jnp.arange(3.0), "b": jnp.ones(3)}
    path = str(tmp_path / "ckpt_bad")
    save_checkpoint(path, tree)
    # same leaf count, different structure
    wrong = {"a": jnp.arange(3.0), "c": jnp.ones(3)}
    with pytest.raises(ValueError, match="structure"):
        load_checkpoint(path, wrong)
    # shape and dtype mismatches are rejected too
    with pytest.raises(ValueError, match="shape"):
        load_checkpoint(path, {"a": jnp.arange(4.0), "b": jnp.ones(3)})
    with pytest.raises(ValueError, match="dtype"):
        load_checkpoint(
            path, {"a": jnp.arange(3.0), "b": jnp.ones(3, jnp.int32)}
        )
    # matching structure loads fine
    back = load_checkpoint(path, tree)
    np.testing.assert_array_equal(np.asarray(back["a"]), np.arange(3.0))


def test_checkpoint_survives_treedef_repr_change(tmp_path):
    """VERDICT r2 item 8: the structure check must be a version-stable
    digest, not treedef-repr equality.  A legacy checkpoint whose stored
    repr string no longer matches (simulated JAX version bump) must still
    load; a genuinely wrong structure must still be rejected."""
    import json, os
    from stheno_tpu.inference import load_checkpoint, save_checkpoint

    tree = {"a": jnp.arange(3.0), "b": {"c": jnp.ones((2, 2))}}
    path = str(tmp_path / "ckpt_legacy")
    save_checkpoint(path, tree, step=7)
    meta_path = os.path.join(path, "meta.json")
    with open(meta_path) as fh:
        meta = json.load(fh)
    # simulate the legacy (round-2) format: treedef repr only, and a repr
    # that no longer matches what this JAX version would produce
    del meta["structure"]
    meta["treedef"] = "PyTreeDef(<some old repr format>)"
    with open(meta_path, "w") as fh:
        json.dump(meta, fh)
    back = load_checkpoint(path, tree)
    np.testing.assert_array_equal(
        np.asarray(back["b"]["c"]), np.ones((2, 2))
    )
    # legacy checkpoints still reject shape scrambles
    with pytest.raises(ValueError, match="shape"):
        load_checkpoint(path, {"a": jnp.ones((2, 2)), "b": {"c": jnp.arange(3.0)}})


def test_segmented_warmup_equals_fused(key):
    """nuts_warmup (whole, and in two segments) reproduces run_nuts's
    internal warmup bit-for-bit: sampling from warmup_result(state) with the
    same top-level key equals the uninterrupted run's draws exactly."""
    from stheno_tpu.inference import (
        nuts_warmup,
        run_nuts,
        warmup_result,
    )

    def logp(q):
        return -0.5 * jnp.sum(q**2) - 0.1 * jnp.sum(q**4)

    W, S, C = 80, 40, 3
    full, _ = run_nuts(
        key, logp, jnp.zeros(2), num_warmup=W, num_samples=S, num_chains=C,
        check_rhat=False,
    )

    # one segment
    st1 = nuts_warmup(key, logp, jnp.zeros(2), num_warmup=W, num_chains=C)
    s1, _ = run_nuts(
        key, logp, jnp.zeros(2), num_samples=S, num_chains=C,
        resume_state=warmup_result(st1), check_rhat=False,
    )
    np.testing.assert_array_equal(np.asarray(s1), np.asarray(full))

    # two segments, resuming mid-warmup
    sta = nuts_warmup(
        key, logp, jnp.zeros(2), num_warmup=W, num_chains=C, segment=(0, 30)
    )
    stb = nuts_warmup(
        key, logp, jnp.zeros(2), num_warmup=W, num_chains=C,
        segment=(30, W), state=sta,
    )
    s2, _ = run_nuts(
        key, logp, jnp.zeros(2), num_samples=S, num_chains=C,
        resume_state=warmup_result(stb), check_rhat=False,
    )
    np.testing.assert_array_equal(np.asarray(s2), np.asarray(full))

    # segment misuse raises
    with pytest.raises(ValueError):
        nuts_warmup(key, logp, jnp.zeros(2), num_warmup=W, segment=(10, 20))


def test_segmented_warmup_traced_start(key):
    """Traced-start mode (`segment=(start, n)` under jit) shares one
    compiled program across segments AND still reproduces the fused warmup
    bit-for-bit."""
    from stheno_tpu.inference import nuts_warmup, run_nuts, warmup_result

    def logp(q):
        return -0.5 * jnp.sum(q**2)

    W, S, C, SEG = 60, 30, 2, 20
    full, _ = run_nuts(
        key, logp, jnp.zeros(2), num_warmup=W, num_samples=S, num_chains=C,
        check_rhat=False,
    )
    st0 = nuts_warmup(
        key, logp, jnp.zeros(2), num_warmup=W, num_chains=C,
        segment=(0, SEG),
    )

    @jax.jit
    def later(start, state):
        return nuts_warmup(
            key, logp, jnp.zeros(2), num_warmup=W, num_chains=C,
            segment=(start, SEG), state=state,
        )

    state = st0
    for a in range(SEG, W, SEG):
        state = later(jnp.asarray(a, jnp.int32), state)
    s2, _ = run_nuts(
        key, logp, jnp.zeros(2), num_samples=S, num_chains=C,
        resume_state=warmup_result(state),
    )
    np.testing.assert_array_equal(np.asarray(s2), np.asarray(full))


def test_segmented_warmup_overshoot_and_concrete_array_start(key):
    """(a) A traced-start segment whose window overshoots num_warmup runs
    the out-of-range iterations as no-ops — a segment length that does not
    divide num_warmup still reproduces the fused warmup bit-for-bit
    (ADVICE.md round 3, medium).  (b) A CONCRETE jax.Array start behaves
    exactly like a plain int — (start, stop) semantics, not (start, len)."""
    from stheno_tpu.inference import nuts_warmup, run_nuts, warmup_result

    def logp(q):
        return -0.5 * jnp.sum(q**2)

    W, S, C, SEG = 50, 20, 2, 20  # 50 % 20 != 0 → last segment overshoots
    full, _ = run_nuts(
        key, logp, jnp.zeros(2), num_warmup=W, num_samples=S, num_chains=C,
        check_rhat=False,
    )
    st = nuts_warmup(
        key, logp, jnp.zeros(2), num_warmup=W, num_chains=C, segment=(0, SEG)
    )

    @jax.jit
    def later(start, state):
        return nuts_warmup(
            key, logp, jnp.zeros(2), num_warmup=W, num_chains=C,
            segment=(start, SEG), state=state,
        )

    for a in range(SEG, W, SEG):  # 20, 40 — the 40 segment overshoots to 60
        st = later(jnp.asarray(a, jnp.int32), st)
    s2, _ = run_nuts(
        key, logp, jnp.zeros(2), num_samples=S, num_chains=C,
        resume_state=warmup_result(st),
    )
    np.testing.assert_array_equal(np.asarray(s2), np.asarray(full))

    # (b) concrete array start == plain int start, (start, stop) semantics
    sta = nuts_warmup(
        key, logp, jnp.zeros(2), num_warmup=W, num_chains=C, segment=(0, 30)
    )
    stb_int = nuts_warmup(
        key, logp, jnp.zeros(2), num_warmup=W, num_chains=C,
        segment=(30, W), state=sta,
    )
    stb_arr = nuts_warmup(
        key, logp, jnp.zeros(2), num_warmup=W, num_chains=C,
        segment=(jnp.asarray(30), jnp.asarray(W)), state=sta,
    )
    np.testing.assert_array_equal(np.asarray(stb_int.q), np.asarray(stb_arr.q))
    s3, _ = run_nuts(
        key, logp, jnp.zeros(2), num_samples=S, num_chains=C,
        resume_state=warmup_result(stb_arr),
    )
    np.testing.assert_array_equal(np.asarray(s3), np.asarray(full))


def test_nuts_warmup_rejects_zero_warmup():
    """num_warmup=0 would index an empty schedule in the traced-segment
    path (ADVICE r4) — must raise immediately instead."""
    import jax
    import jax.numpy as jnp
    import pytest

    from stheno_tpu.inference.hmc import nuts_warmup

    with pytest.raises(ValueError, match="num_warmup"):
        nuts_warmup(
            jax.random.PRNGKey(0),
            lambda q: -0.5 * jnp.sum(q**2),
            jnp.zeros(2),
            num_warmup=0,
        )


def test_precision_auto_policy_resolution():
    """'auto' pins HIGHEST exactly when the log-density factorises an f32
    covariance at/above the threshold (VERDICT r4 weak-item 1)."""
    import contextlib

    import jax
    import jax.numpy as jnp
    import pytest
    from jax import lax

    from stheno_tpu.inference import hmc
    from stheno_tpu.ops.chol import cholesky_psd

    def make_ld(n, dtype):
        K = jnp.eye(n, dtype=dtype)

        def ld(q):
            L = cholesky_psd(K + q[0].astype(dtype) * 0)
            return -jnp.sum(jnp.log(jnp.diagonal(L))) - 0.5 * jnp.sum(q**2)

        return ld

    prev = hmc.AUTO_HIGHEST_MIN_N
    hmc.AUTO_HIGHEST_MIN_N = 64
    try:
        with pytest.warns(UserWarning, match="HIGHEST"):
            _, p = hmc._precision_policy(
                "auto", make_ld(128, jnp.float32), 2, jnp.float32)
        assert p == lax.Precision.HIGHEST
        # f64 factorisations have no cliff: no upgrade
        with contextlib.suppress(Exception):
            import warnings

            with warnings.catch_warnings():
                warnings.simplefilter("error")
                _, p = hmc._precision_policy(
                    "auto", make_ld(128, jnp.float64), 2, jnp.float64)
        assert p is None
        # below threshold: no upgrade
        hmc.AUTO_HIGHEST_MIN_N = 4096
        _, p = hmc._precision_policy(
            "auto", make_ld(128, jnp.float32), 2, jnp.float32)
        assert p is None
    finally:
        hmc.AUTO_HIGHEST_MIN_N = prev
    # None and explicit pass-throughs
    _, p = hmc._precision_policy(None, make_ld(8, jnp.float32), 2, jnp.float32)
    assert p is None
    _, p = hmc._precision_policy(
        "highest", make_ld(8, jnp.float32), 2, jnp.float32)
    assert p == lax.Precision.HIGHEST


def test_run_nuts_auto_precision_scopes_trace():
    """Integration: run_nuts under the lowered threshold emits the policy
    warning and still samples correctly."""
    import jax
    import jax.numpy as jnp
    import pytest

    from stheno_tpu.inference import hmc
    from stheno_tpu.ops.chol import cholesky_psd

    n = 96
    K = jnp.eye(n, dtype=jnp.float32)

    def ld(q):
        L = cholesky_psd(K * jnp.exp(q[0]).astype(jnp.float32))
        return -jnp.sum(jnp.log(jnp.diagonal(L))) - 0.5 * jnp.sum(q**2)

    prev = hmc.AUTO_HIGHEST_MIN_N
    hmc.AUTO_HIGHEST_MIN_N = 64
    try:
        with pytest.warns(UserWarning, match="HIGHEST"):
            samples, info = hmc.run_nuts(
                jax.random.PRNGKey(0), ld, jnp.zeros(1, jnp.float32),
                num_warmup=30, num_samples=10, num_chains=2, max_depth=4)
        assert samples.shape == (2, 10, 1)
        assert jnp.all(jnp.isfinite(samples))
    finally:
        hmc.AUTO_HIGHEST_MIN_N = prev


def test_run_nuts_warns_on_unmixed_chains():
    """Chains stuck in separate far modes must trigger the loud split-R-hat
    warning (VERDICT r4 weak-item 1: nothing connected diagnostics to the
    user)."""
    import jax
    import jax.numpy as jnp
    import pytest

    from stheno_tpu.inference import run_nuts

    def bimodal(q):
        # two needle modes at ±10; a chain initialised near one cannot cross
        a = -0.5 * 200.0 * (q[0] - 10.0) ** 2
        b = -0.5 * 200.0 * (q[0] + 10.0) ** 2
        return jnp.logaddexp(a, b)

    with pytest.warns(UserWarning, match="not mixed"):
        run_nuts(
            jax.random.PRNGKey(3), bimodal, jnp.asarray([10.0]),
            num_warmup=40, num_samples=24, num_chains=4, max_depth=4,
            init_jitter=20.0)


def test_smc_segmented_matches_fused_bitexact(key):
    """smc_init → smc_segment* → smc_result with the same top-level key must
    be BIT-identical to the fused run_smc (per-stage fold_in keys), for any
    segmentation — including overshooting segments past termination
    (VERDICT r4 weak-item 2)."""
    from stheno_tpu.inference import (
        run_smc,
        smc_finished,
        smc_init,
        smc_result,
        smc_segment,
    )

    d = 2

    def loglike(q):
        return -0.5 * jnp.sum((q - 1.0) ** 2)

    def logprior(q):
        return -0.5 * jnp.sum(q**2)

    P_ = 256
    init = jax.random.normal(key, (P_, d))
    run_key = jax.random.PRNGKey(7)
    kw = dict(num_mcmc=3, hmc_step_size=0.5, hmc_num_steps=4, max_stages=20)

    fused = run_smc(run_key, loglike, logprior, init, **kw)

    for seg_sizes in [(1,), (2,), (3, 4)]:
        state = smc_init(loglike, logprior, init, max_stages=20)
        i = 0
        while not bool(smc_finished(state, max_stages=20)):
            n = seg_sizes[min(i, len(seg_sizes) - 1)]
            state = smc_segment(
                run_key, loglike, logprior, init, state, n, **kw)
            i += 1
        # extra overshooting segment: exact no-op
        state2 = smc_segment(run_key, loglike, logprior, init, state, 3, **kw)
        seg = smc_result(state2, init)
        np.testing.assert_array_equal(
            np.asarray(seg.particles), np.asarray(fused.particles))
        np.testing.assert_array_equal(
            float(seg.log_evidence), float(fused.log_evidence))
        assert int(seg.num_stages) == int(fused.num_stages)
        np.testing.assert_array_equal(
            np.asarray(seg.beta_history), np.asarray(fused.beta_history))


def test_smc_segment_jit_shares_compile(key):
    """smc_segment must be jittable with the state as a donated-style arg
    (one compile serves every segment of a run)."""
    from stheno_tpu.inference import smc_init, smc_segment

    def loglike(q):
        return -0.5 * jnp.sum((q - 1.0) ** 2)

    def logprior(q):
        return -0.5 * jnp.sum(q**2)

    init = jax.random.normal(key, (128, 2))
    seg_j = jax.jit(
        lambda k, st: smc_segment(
            k, loglike, logprior, init, st, 2, num_mcmc=2,
            hmc_step_size=0.5, hmc_num_steps=4, max_stages=10)
    )
    state = smc_init(loglike, logprior, init, max_stages=10)
    k = jax.random.PRNGKey(5)
    state = seg_j(k, state)
    st1 = seg_j(k, state)
    assert float(st1.beta) >= float(state.beta)
