import jax.numpy as jnp
import numpy as np
import pytest

from flightjax.ops import geodesy as G
from flightjax.ops import attitude as A
from flightjax.ops import quaternions as Q


def test_nvector_latlon_roundtrip():
    lats = np.linspace(-np.pi / 2, np.pi / 2, 11)
    lons = np.linspace(-np.pi, np.pi, 11)
    LAT, LON = np.meshgrid(lats[1:-1], lons, indexing="ij")
    n_e = G.nvector_from_latlon(jnp.asarray(LAT), jnp.asarray(LON))
    np.testing.assert_allclose(np.linalg.norm(np.asarray(n_e), axis=-1), 1.0, rtol=1e-14)
    lat2, lon2 = G.latlon_from_nvector(n_e)
    np.testing.assert_allclose(lat2, LAT, atol=1e-12)
    # wrap lon equivalence
    np.testing.assert_allclose(np.cos(np.asarray(lon2)), np.cos(LON), atol=1e-12)
    np.testing.assert_allclose(np.sin(np.asarray(lon2)), np.sin(LON), atol=1e-12)


def test_ltf_wander_angle():
    n_e = G.nvector_from_latlon(0.6, -1.1)
    q_en = G.ltf(n_e)
    np.testing.assert_allclose(G.get_psi_nw(q_en), 0.0, atol=1e-12)
    psi_nw = np.pi / 3
    q_ew = Q.qmul(q_en, A.rot_z(psi_nw))
    np.testing.assert_allclose(G.get_psi_nw(q_ew), psi_nw, atol=1e-12)
    np.testing.assert_allclose(G.nvector_from_qew(q_ew), n_e, atol=1e-12)
    # NED down axis points along -n_e in ECEF: third col of R_en = -n_e
    R = A.quat_to_matrix(q_en)
    np.testing.assert_allclose(R[..., :, 2], -n_e, atol=1e-12)


def test_cartesian_roundtrip():
    rng = np.random.default_rng(0)
    lat = jnp.asarray(rng.uniform(-np.pi / 2 * 0.999, np.pi / 2 * 0.999, 100))
    lon = jnp.asarray(rng.uniform(-np.pi, np.pi, 100))
    h = jnp.asarray(rng.uniform(-500, 30000, 100))
    n_e = G.nvector_from_latlon(lat, lon)
    r = G.cartesian_from_geographic(n_e, h)
    n2, h2 = G.geographic_from_cartesian(r)
    np.testing.assert_allclose(h2, h, atol=1e-6)
    np.testing.assert_allclose(n2, n_e, atol=1e-12)


def test_cartesian_known_points():
    # equator/prime meridian at h=0: x = a
    n_e = G.nvector_from_latlon(0.0, 0.0)
    r = G.cartesian_from_geographic(n_e, 0.0)
    np.testing.assert_allclose(r, [G.a, 0.0, 0.0], atol=1e-8)
    # north pole at h=0: z = b
    n_e = G.nvector_from_latlon(np.pi / 2, 0.0)
    r = G.cartesian_from_geographic(n_e, 0.0)
    np.testing.assert_allclose(np.asarray(r)[2], G.b, atol=1e-6)
    # polar-axis inverse works
    n2, h2 = G.geographic_from_cartesian(jnp.asarray([0.0, 0.0, G.b + 100.0]))
    np.testing.assert_allclose(h2, 100.0, atol=1e-6)
    np.testing.assert_allclose(np.asarray(n2)[2], 1.0, atol=1e-9)


def test_gravity():
    # WGS84 defined surface gravity at equator and poles
    n_eq = G.nvector_from_latlon(0.0, 0.3)
    np.testing.assert_allclose(G.gravity(n_eq, 0.0), G.g_a, rtol=1e-9)
    n_po = G.nvector_from_latlon(np.pi / 2, 0.0)
    np.testing.assert_allclose(G.gravity(n_po, 0.0), G.g_b, rtol=1e-9)
    # decreases with altitude roughly 3.086e-6 m/s2 per m
    g0 = float(G.gravity(n_eq, 0.0))
    g1k = float(G.gravity(n_eq, 1000.0))
    assert 2.5e-6 < (g0 - g1k) / 1000 < 3.5e-6
    gn = G.g_n(n_eq, 0.0)
    np.testing.assert_allclose(gn, [0.0, 0.0, g0], atol=1e-12)


def test_G_n_centrifugal():
    n_e = G.nvector_from_latlon(0.7, 0.2)
    Gn = np.asarray(G.G_n(n_e, 0.0))
    gn = np.asarray(G.g_n(n_e, 0.0))
    # gravitation = gravity + omega x (omega x r): bigger down-component, north tilt
    assert Gn[2] > gn[2]
    assert abs(Gn[0]) > 0
    np.testing.assert_allclose(Gn[1], 0.0, atol=1e-9)


def test_geoid():
    # EGM96 undulation: about +17 m over continental Europe, about -30 m over
    # the Indian Ocean low; grid poles constant.
    n_e = G.nvector_from_latlon(np.deg2rad(47.0), np.deg2rad(13.0))
    h = float(G.geoid_height(n_e))
    assert 40 < h < 55  # Alps region ~46-48 m
    n_e = G.nvector_from_latlon(np.deg2rad(4.7), np.deg2rad(78.8))
    assert float(G.geoid_height(n_e)) < -80  # Indian Ocean geoid low ~ -100 m
    # datum round trip
    h_orth = 1500.0
    h_ellip = G.ellip_from_orth(h_orth, n_e)
    np.testing.assert_allclose(G.orth_from_ellip(h_ellip, n_e), h_orth, atol=1e-9)
    h_geop = G.geop_from_orth(jnp.asarray(h_orth))
    np.testing.assert_allclose(G.orth_from_geop(h_geop), h_orth, atol=1e-9)
    assert h_geop < h_orth


def test_radii():
    n_e = G.nvector_from_latlon(0.0, 0.0)
    M, N = G.radii(n_e)
    np.testing.assert_allclose(N, G.a, rtol=1e-12)
    np.testing.assert_allclose(M, G.a * (1 - G.e2), rtol=1e-12)
    n_p = G.nvector_from_latlon(np.pi / 2, 0.0)
    Mp, Np = G.radii(n_p)
    np.testing.assert_allclose(Mp, Np, rtol=1e-12)  # both = a/sqrt(1-e2)


pytestmark = pytest.mark.fast
