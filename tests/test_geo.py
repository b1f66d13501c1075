"""Geo layer coverage: geohash cells, covering, the geopoint analyzer,
and the GeoDistance filter end-to-end against a brute-force haversine
oracle (functions/geo.py; filter in query/filters.py + exec.py)."""
import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from iresearch_ray.functions import geo


def test_geohash_published_vector_and_bounds():
    # the classic test vector (Wikipedia/geohash.org)
    assert geo.geohash_encode([57.64911], [10.40744], 11)[0] == \
        "u4pruydqqvj"
    gh = geo.geohash_encode([48.8566], [2.3522], 7)[0]
    lat_lo, lat_hi, lon_lo, lon_hi = geo.geohash_bounds(gh)
    assert lat_lo <= 48.8566 <= lat_hi and lon_lo <= 2.3522 <= lon_hi
    # cell sizes halve per bit: precision 7 = 17 lon bits, 18... no:
    # 35 bits -> 18 lon + 17 lat; height 180/2^17, width 360/2^18
    assert lat_hi - lat_lo == pytest.approx(180.0 / (1 << 17))
    assert lon_hi - lon_lo == pytest.approx(360.0 / (1 << 18))


def test_geohash_vectorized_matches_scalar_bounds():
    rng = np.random.default_rng(3)
    lats = rng.uniform(-90, 90, 200)
    lons = rng.uniform(-180, 180, 200)
    ghs = geo.geohash_encode(lats, lons, 6)
    for la, lo, gh in zip(lats, lons, ghs):
        b = geo.geohash_bounds(gh)
        assert b[0] <= la <= b[1] and b[2] <= lo <= b[3]


def test_covering_containment_property():
    """Every point inside the query circle falls in a covering cell —
    randomized over centers including polar caps and the antimeridian."""
    rng = np.random.default_rng(5)
    centers = [(float(rng.uniform(-80, 80)), float(rng.uniform(-180, 180)),
                float(rng.uniform(1, 3000))) for _ in range(25)]
    centers += [(88.0, 0.0, 500.0), (-89.5, 120.0, 300.0),
                (0.0, 179.95, 400.0), (10.0, -179.99, 800.0)]
    for lat, lon, r in centers:
        p, cells = geo.covering_cells(lat, lon, r)
        cs = set(cells)
        assert len(cells) <= 64
        for _ in range(50):
            br = np.sqrt(rng.uniform()) * r
            th = rng.uniform(0, 2 * np.pi)
            pl = np.clip(lat + np.degrees(br / geo.EARTH_RADIUS_KM)
                         * np.cos(th), -90, 90)
            denom = max(1e-9, np.cos(np.radians(pl)))
            pn = ((lon + np.degrees(br / geo.EARTH_RADIUS_KM)
                   * np.sin(th) / denom + 180) % 360) - 180
            if geo.haversine_km(lat, lon, pl, pn) > r:
                continue
            assert geo.geohash_encode([pl], [pn], p)[0] in cs, \
                (lat, lon, r, pl, pn)


def test_geopoint_analyzer_prefixes_and_errors():
    a = geo.GeoPointAnalyzer(5)
    toks = a(["57.64911,10.40744", None, ""])
    assert toks[0] == ["u", "u4", "u4p", "u4pr", "u4pru"]
    assert toks[1] == [] and toks[2] == []
    with pytest.raises(ValueError, match="bad geopoint"):
        a(["nope"])
    with pytest.raises(ValueError, match="out of range"):
        a(["95,0"])
    from iresearch_ray.functions.analysis import get_analyzer

    assert get_analyzer("geopoint", max_precision=3)(["1,2"])[0] == \
        a(["1,2"])[0][:3]


def test_haversine_known_distances():
    # Paris <-> Sydney great-circle ~= 16960 km (published)
    d = float(geo.haversine_km(48.8566, 2.3522, -33.8688, 151.2093))
    assert abs(d - 16960) < 30
    assert float(geo.haversine_km(0, 0, 0, 0)) == 0.0
    # one degree of longitude at the equator ~= 111.19 km
    assert abs(float(geo.haversine_km(0, 0, 0, 1)) - 111.19) < 0.1


def test_geo_distance_filter_end_to_end(ray_session, tmp_path):
    """GeoDistance over a built index == brute-force haversine, across
    radii, the polar cap, the antimeridian, zero radius, composition
    under And, and consolidation (results identical after merge)."""
    import ray

    from iresearch_ray import Searcher, build_index
    from iresearch_ray.pipelines.consolidate import consolidate
    from iresearch_ray.query import filters as F
    from iresearch_ray.stages.segment import IndexConfig

    rng = np.random.default_rng(7)
    n = 2500
    lat = rng.uniform(-85, 85, n).round(5)
    lon = rng.uniform(-180, 180, n).round(5)
    tbl = pa.table({
        "conv_id": pa.array([f"c{i:05d}" for i in range(n)]),
        "turn_idx": pa.array(np.zeros(n, np.int32), pa.int32()),
        "text": pa.array([f"doc {i}" for i in range(n)]),
        "role": pa.array(["user", "agent"] * (n // 2)),
        "tool": pa.array([""] * n),
        "ts": pa.array(np.arange(n), pa.int64()).cast(pa.timestamp("us")),
        "geo": pa.array([f"{a},{b}" for a, b in zip(lat, lon)]),
    })
    src = str(tmp_path / "src.parquet")
    idx = str(tmp_path / "idx")
    pq.write_table(tbl, src)
    build_index(src, idx, cfg=IndexConfig(geo_fields=("geo",)),
                num_partitions=3)
    s = Searcher(idx)
    queries = [(48.85, 2.35, 1500.0), (-33.9, 151.2, 800.0),
               (80.0, 10.0, 2500.0), (0.0, 179.9, 600.0),
               (48.85, 2.35, 0.0)]

    def brute(qlat, qlon, r):
        return sorted(f"c{i:05d}" for i in range(n)
                      if geo.haversine_km(lat[i], lon[i], qlat, qlon) <= r)

    for qlat, qlon, r in queries:
        res = s.search_local(F.GeoDistance("geo", qlat, qlon, r), k=n)
        assert sorted(res["conv_id"].tolist()) == brute(qlat, qlon, r), \
            (qlat, qlon, r)
    # composition: geo AND keyword
    res = s.search_local(
        F.And((F.GeoDistance("geo", 80.0, 10.0, 2500.0),
               F.Term("role", "agent"))), k=n)
    want = [c for c in brute(80.0, 10.0, 2500.0) if int(c[1:]) % 2 == 1]
    assert sorted(res["conv_id"].tolist()) == want
    # nearest-k: score_distance orders by distance, nearest first
    k = 25
    res = s.search_local(
        F.GeoDistance("geo", 48.85, 2.35, 8000.0, score_distance=True),
        k=k)
    d = geo.haversine_km(lat, lon, 48.85, 2.35)
    order = np.argsort(d, kind="stable")
    want_near = [f"c{i:05d}" for i in order[:k] if d[i] <= 8000.0]
    assert res["conv_id"].tolist() == want_near
    # consolidation must not change geo results (stored column + terms
    # both splice through the merge)
    before = s.search_local(F.GeoDistance("geo", 48.85, 2.35, 1500.0), k=n)
    consolidate(idx, policy="count", policy_kwargs={"threshold": 1},
                gc=True)
    after = Searcher(idx).search_local(
        F.GeoDistance("geo", 48.85, 2.35, 1500.0), k=n)
    assert sorted(before["conv_id"]) == sorted(after["conv_id"])
