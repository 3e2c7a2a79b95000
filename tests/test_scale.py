"""Scale-function tests ported from the reference suite
(/root/reference/test/scale_function_tests.jl)."""

import numpy as np
import pytest

from tdigest_spark.scale import K_0, K_1, K_2, K_3, SCALES

ROUND_TRIP_TOL = {"K_0": 1e-15, "K_1": 2e-5, "K_2": 1e-12, "K_3": 1e-11}


def _probe_qs():
    # 10,004 q points incl. extremes (scale_function_tests.jl:15-58)
    qs = np.linspace(0, 1, 10_000)
    return np.concatenate(([0.0, 1e-10, 1 - 1e-10, 1.0], qs))


@pytest.mark.parametrize("name", list(SCALES))
@pytest.mark.parametrize("delta", [10, 30, 100, 300, 1000])
@pytest.mark.parametrize("n", [10, 1_000, 1_000_000, 1_000_000_000])
def test_round_trip(name, delta, n):
    scale = SCALES[name]
    qs = _probe_qs()
    tol = ROUND_TRIP_TOL[name]
    # (delta, n) form
    k = scale.k_cn(qs, delta, n)
    back = scale.q_cn(k, delta, n)
    clipped = np.clip(qs, 1e-15, 1 - 1e-15)
    assert np.max(np.abs(back - clipped)) <= tol
    # normalized form
    norm = scale.normalizer(delta, n)
    k2 = scale.k(qs, norm)
    back2 = scale.q(k2, norm)
    assert np.max(np.abs(back2 - clipped)) <= tol


@pytest.mark.parametrize("name", list(SCALES))
def test_monotone(name):
    scale = SCALES[name]
    qs = np.linspace(1e-6, 1 - 1e-6, 5000)
    k = scale.k_cn(qs, 100, 10_000)
    assert np.all(np.diff(k) >= 0)


def test_normalized_equals_cn_form():
    qs = np.linspace(1e-6, 1 - 1e-6, 101)
    for name, scale in SCALES.items():
        norm = scale.normalizer(100, 10_000)
        a = scale.k(qs, norm)
        b = scale.k_cn(qs, 100, 10_000)
        np.testing.assert_allclose(a, b, atol=1e-9, err_msg=name)


def test_golden_values():
    """Pinned analytic golden values at delta=100, n=10_000 (the reference
    checks against a Java-generated ref.csv at atol 1e-5; we re-derive the
    same formulas and pin spot values)."""
    d, n = 100.0, 10_000.0
    # K_0: k = delta*q/2
    assert abs(K_0.k_cn(0.25, d, n) - 12.5) < 1e-12
    # K_1: k = delta*asin(2q-1)/(2pi)
    assert abs(K_1.k_cn(0.5, d, n) - 0.0) < 1e-12
    assert abs(K_1.k_cn(1.0, d, n) - d / 4.0) < 1e-3
    # K_2: k = delta*log(q/(1-q))/Z, Z = 4 ln(n/delta) + 24
    z2 = 4 * np.log(n / d) + 24
    assert abs(K_2.k_cn(0.9, d, n) - d * np.log(9.0) / z2) < 1e-12
    # K_3: q<=0.5 -> delta*log(2q)/Z, Z = 4 ln(n/delta) + 21
    z3 = 4 * np.log(n / d) + 21
    assert abs(K_3.k_cn(0.25, d, n) - d * np.log(0.5) / z3) < 1e-12
    assert abs(K_3.k_cn(0.75, d, n) + d * np.log(0.5) / z3) < 1e-12


REF_CSV = "/root/reference/test/ref.csv"


@pytest.mark.skipif(
    not __import__("os").path.exists(REF_CSV), reason="reference ref.csv absent"
)
def test_golden_ref_csv():
    """The reference's cross-implementation golden artifact: a
    Java-t-digest-generated table of k_scale(q, 100, 10_000) for
    K_0..K_3 at q = 0.00..1.00, checked at atol 1e-5 exactly as the
    reference harness does (test/scale_function_tests.jl:72-80).  Unlike
    the analytic spot checks below, these values share no formulas with
    this implementation — they pin the port to the Java lineage."""
    with open(REF_CSV) as f:
        rows = [
            line.strip().split(",")
            for line in f
            if line.strip() and not line.startswith("#")
        ]
    header = rows[0]
    assert header == ["q", "K_0", "K_1", "K_2", "K_3"]
    assert len(rows) == 101  # header + 100 q points (0.00..0.99)
    for row in rows[1:]:
        q = float(row[0])
        for i, name in enumerate(header[1:], start=1):
            got = float(SCALES[name].k_cn(q, 100, 10_000))
            assert abs(got - float(row[i])) <= 1e-5, (name, q, got, row[i])


def test_limit_clamps():
    # extreme q never yields inf/nan (scale_function_tests.jl:4-11)
    for scale in SCALES.values():
        for q in [0.0, 1.0, -0.5, 1.5]:
            v = float(scale.k_cn(q, 100, 1e6))
            assert np.isfinite(v)


def test_max_step_formulas():
    d, n = 100.0, 10_000.0
    norm1 = K_1.normalizer(d, n)
    q = 0.3
    assert abs(
        K_1.max_step(q, norm1) - 2 * np.sin(0.5 / norm1) * np.sqrt(q * (1 - q))
    ) < 1e-15
    norm2 = K_2.normalizer(d, n)
    assert abs(K_2.max_step(q, norm2) - q * (1 - q) / norm2) < 1e-15
    norm3 = K_3.normalizer(d, n)
    assert abs(K_3.max_step(q, norm3) - min(q, 1 - q) / norm3) < 1e-15


def test_digest_level_max_step():
    """Digest wrapper dispatches to the scale's (compression, n) form with
    n = centroid count, at private/public compression (TDigest.jl:125-128)."""
    from tdigest_spark.core import MergingDigest

    d = MergingDigest(100.0, scale=K_2)
    d.add(np.linspace(0.0, 1.0, 5000))
    n_cent = len(d)
    for q in (0.1, 0.5, 0.9):
        priv = d.max_step(q)
        pub = d.max_step(q, private=False)
        assert priv == K_2.max_step_cn(q, d.private_compression, n_cent)
        assert pub == K_2.max_step_cn(q, d.public_compression, n_cent)
        # two-level: private compression > public -> smaller step
        assert priv < pub


def test_limit_closed_forms_match_composition():
    """scale.limit (segmented closed forms, the ingest hot path) must agree
    with the literal q(k(q0)+1, norm) composition to a few ulp, and stay
    monotone over ascending q0 (the merge walk searchsorts against it)."""
    from tdigest_spark.scale import K_0, K_1, K_2, K_3, ScaleFunction

    for scale in (K_0, K_1, K_2, K_3):
        # K_1's asin/angle-identity forms both lose precision at the
        # clipped extremes (asin is ill-conditioned near |s|=1); elsewhere
        # everything is <= ~1e-14 relative.
        tol = 1e-12 if scale is K_1 else 5e-14
        for norm in (1.6, 5.0, 17.0, 40.0):
            q0 = np.unique(
                np.concatenate(
                    [
                        np.linspace(1e-16, 1.0, 5001),
                        [1e-15, 0.5 - 1e-16, 0.5, 0.5 + 1e-16, 1 - 1e-15, 1.0],
                        np.exp(np.linspace(np.log(1e-15), 0.0, 1000)),
                    ]
                )
            )
            ref = ScaleFunction.limit(scale, q0, norm)
            got = scale.limit(q0, norm)
            rel = np.abs(got - ref) / np.maximum(np.abs(ref), 1e-300)
            assert rel.max() < tol, (scale.name, norm, rel.max())
            assert np.all(np.diff(got) >= -1e-16), (scale.name, norm)
