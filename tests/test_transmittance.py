"""Non-exponential transmittance law tests, incl. the `interpolated`
law (ref src/core/transmittances/InterpolatedTransmittance.cpp: lerp of
two child laws with ratio u; surfaceSurface normalizes children by
their sigmaBar, surfaceMedium = mediumSurface * sigmaBar, mediumMedium
has a dirac exception, sampling is a discrete child choice).
"""
import numpy as np
import jax.numpy as jnp

from tungsten_tpu.media import transmittance as TR


def _interp_row(ta, pa, tb, pb, ratio):
    row = [0.0] * 16
    row[4] = float(ta)
    row[5] = float(tb)
    row[6] = float(ratio)
    row[8:8 + len(pa)] = pa
    row[12:12 + len(pb)] = pb
    return row


def _base_row16(t, p):
    # a base law carried in a 16-wide table (scene has some interpolated
    # medium elsewhere): cols 0:4 hold its params
    row = [0.0] * 16
    row[:len(p)] = p
    return row


TAU = np.linspace(0.01, 4.0, 23, dtype=np.float32)


class TestInterpolated:
    def _eval_all(self, ttype, params):
        t = jnp.asarray([ttype], jnp.int32)
        p = jnp.asarray([params], jnp.float32)
        tau = jnp.asarray(TAU)[None, :]
        return {
            "ss": np.asarray(TR.surface_surface(t, tau, p))[0],
            "sm": np.asarray(TR.surface_medium(t, tau, p))[0],
            "ms": np.asarray(TR.medium_surface(t, tau, p))[0],
            "mm": np.asarray(TR.medium_medium(t, tau, p))[0],
            "sbar": float(np.asarray(TR.sigma_bar(t, p))[0]),
        }

    def test_ratio_endpoints_match_children(self):
        # ratio 0 -> pure tr_a, ratio 1 -> pure tr_b, for every kernel
        pa, pb = [1.5, 0, 0, 0], [5.0, 0, 0, 0]  # linear(max_t) / erlang
        a = self._eval_all(TR.T_LINEAR, _base_row16(TR.T_LINEAR, pa))
        b = self._eval_all(TR.T_ERLANG, _base_row16(TR.T_ERLANG, pb))
        i0 = self._eval_all(TR.T_INTERPOLATED,
                            _interp_row(TR.T_LINEAR, pa, TR.T_ERLANG, pb, 0.0))
        i1 = self._eval_all(TR.T_INTERPOLATED,
                            _interp_row(TR.T_LINEAR, pa, TR.T_ERLANG, pb, 1.0))
        for k in ("ss", "sm", "ms", "mm", "sbar"):
            np.testing.assert_allclose(i0[k], a[k], rtol=1e-5, atol=1e-6,
                                       err_msg=f"ratio=0 {k}")
            np.testing.assert_allclose(i1[k], b[k], rtol=1e-5, atol=1e-6,
                                       err_msg=f"ratio=1 {k}")

    def test_sigma_bar_harmonic(self):
        # sigmaBar = 1/lerp(1/A, 1/B, u) (InterpolatedTransmittance.cpp:73)
        pa, pb = [2.0, 0, 0, 0], [6.0, 0, 0, 0]
        row = _interp_row(TR.T_LINEAR, pa, TR.T_ERLANG, pb, 0.25)
        got = self._eval_all(TR.T_INTERPOLATED, row)["sbar"]
        sa = 1.0 / 2.0          # linear sigmaBar = 1/max_t
        sb = 6.0 * 0.5          # erlang sigmaBar = lambda/2
        want = 1.0 / (0.75 / sa + 0.25 / sb)
        np.testing.assert_allclose(got, want, rtol=1e-5)

    def test_medium_surface_is_plain_lerp(self):
        pa, pb = [1.5, 0, 0, 0], [5.0, 0, 0, 0]
        a = self._eval_all(TR.T_LINEAR, _base_row16(TR.T_LINEAR, pa))
        b = self._eval_all(TR.T_ERLANG, _base_row16(TR.T_ERLANG, pb))
        i = self._eval_all(TR.T_INTERPOLATED,
                           _interp_row(TR.T_LINEAR, pa, TR.T_ERLANG, pb, 0.3))
        np.testing.assert_allclose(i["ms"], 0.7 * a["ms"] + 0.3 * b["ms"],
                                   rtol=1e-5, atol=1e-6)

    def test_mm_dirac_exception(self):
        # linear's mediumMedium is a dirac at max_t: where it has mass,
        # the interpolated density is the dirac's alone, un-lerped
        pa, pb = [2.0, 0, 0, 0], [5.0, 0, 0, 0]
        t = jnp.asarray([TR.T_INTERPOLATED], jnp.int32)
        p = jnp.asarray([_interp_row(TR.T_LINEAR, pa, TR.T_ERLANG, pb, 0.5)],
                        jnp.float32)
        tau = jnp.asarray([[2.0]])  # exactly at the linear dirac
        mm = float(np.asarray(TR.medium_medium(t, tau, p))[0, 0])
        ta = jnp.asarray([TR.T_LINEAR], jnp.int32)
        mma = float(np.asarray(TR.medium_medium(
            ta, tau, jnp.asarray([pa], jnp.float32)))[0, 0])
        np.testing.assert_allclose(mm, mma, rtol=1e-5)

    def test_sample_distance_matches_children_stats(self):
        # the interpolated sampler draws child A with prob 1-u: the
        # sample mean should approach lerp of the children's means
        rng = np.random.default_rng(7)
        N = 20000
        u1 = jnp.asarray(rng.random(N, dtype=np.float32))
        u2 = jnp.asarray(rng.random(N, dtype=np.float32))
        surf = jnp.ones((N,), bool)
        pa, pb = [2.0, 0, 0, 0], [5.0, 0, 0, 0]

        def mean_for(tt, row):
            t = jnp.full((N,), tt, jnp.int32)
            p = jnp.broadcast_to(jnp.asarray(row, jnp.float32),
                                 (N, len(row)))
            return float(jnp.mean(TR.sample_distance(t, p, surf, u1, u2)))

        ma = mean_for(TR.T_LINEAR, _base_row16(TR.T_LINEAR, pa))
        mb = mean_for(TR.T_ERLANG, _base_row16(TR.T_ERLANG, pb))
        mi = mean_for(TR.T_INTERPOLATED,
                      _interp_row(TR.T_LINEAR, pa, TR.T_ERLANG, pb, 0.4))
        assert abs(mi - (0.6 * ma + 0.4 * mb)) < 0.05 * max(ma, mb)

    def test_base_laws_unchanged_by_wide_table(self):
        # a base law evaluated through a 16-col table equals the 4-col path
        for tt, pp in ((TR.T_EXPONENTIAL, [0, 0, 0, 0]),
                       (TR.T_DAVIS, [1.3, 0, 0, 0]),
                       (TR.T_PULSE, [0.0, 1.0, 4.0, 0])):
            wide = self._eval_all(tt, _base_row16(tt, pp))
            t = jnp.asarray([tt], jnp.int32)
            p4 = jnp.asarray([pp], jnp.float32)
            tau = jnp.asarray(TAU)[None, :]
            np.testing.assert_allclose(
                wide["ss"], np.asarray(TR.surface_surface(t, tau, p4))[0],
                rtol=1e-6)


class TestInterpolatedRender:
    def test_end_to_end_scene(self):
        # a homogeneous medium with an interpolated transmittance renders
        # finite and differs from the pure-exponential image
        from tests.test_media import _desc, _render
        base = _desc([{"type": "homogeneous", "sigma_a": 0.3,
                       "sigma_s": 1.2}], {"int_medium_index": 0})
        interp = _desc([{"type": "homogeneous", "sigma_a": 0.3,
                         "sigma_s": 1.2,
                         "transmittance": {
                             "type": "interpolated",
                             "tr_a": {"type": "linear", "max_t": 1.0},
                             "tr_b": {"type": "erlang", "rate": 5.0},
                             "ratio": 0.5}}], {"int_medium_index": 0})
        img_b = _render(base, spp=4)
        img_i = _render(interp, spp=4)
        assert np.isfinite(img_i).all()
        assert np.abs(img_i - img_b).mean() > 1e-4
