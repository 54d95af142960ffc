"""The geowave CLI surface (geowave_spark/cli.py vs GeoWaveMain.java).

Every operation runs in-process through cli.main(argv) — get_spark()'s
getOrCreate reuses the pytest session — over a store ingested by the CLI
itself, and each query op is checked against the direct-API result it must
equal (the reference keeps clientCql around precisely as the consistency
twin of serverCql; we hold ALL query ops to that standard)."""

from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F

from geowave_spark import cli

N = 400


@pytest.fixture(scope="module")
def tdrive_csv(tmp_path_factory):
    """Deterministic taxi traces: lon in [-60, 60), lat in [-30, 30),
    one point per minute across two calendar days."""
    rows = []
    for i in range(N):
        taxi = i % 8
        lon = -60.0 + (i * 0.3) % 120.0
        lat = -30.0 + (i * 0.17) % 60.0
        day = 1 + (i % 2)
        rows.append(f"{taxi},2021-06-{day:02d} {(i // 60) % 24:02d}:{i % 60:02d}:00,{lon:.4f},{lat:.4f}")
    p = tmp_path_factory.mktemp("cli") / "taxis.txt"
    p.write_text("\n".join(rows) + "\n")
    return p


@pytest.fixture(scope="module")
def store(spark, tdrive_csv, tmp_path_factory):
    """A store with one CLI-ingested type."""
    d = tmp_path_factory.mktemp("cli") / "store"
    rc = cli.main([
        "localingest", "--store", str(d), "--type", "taxis",
        "--input", str(tdrive_csv), "--format", "tdrive",
    ])
    assert rc == 0
    return d


class TestIngest:
    def test_localingest_wrote_indexed_layout(self, spark, store):
        df = spark.read.parquet(str(store / "taxis"))
        assert df.count() == N
        assert {"cell", "tier", "lon", "lat", "ts"} <= set(df.columns)
        # stats sidecar written (RowRangeHistogramStatistics analog)
        assert (store / "taxis" / "_stats.json").exists()

    def test_stage_then_poststage_equals_localingest(self, spark, store,
                                                     tdrive_csv, tmp_path):
        d = tmp_path / "store2"
        assert cli.main(["stage", "--store", str(d), "--type", "taxis",
                         "--input", str(tdrive_csv), "--format", "tdrive"]) == 0
        assert (d / "_staged" / "taxis" / "_SUCCESS").exists()
        assert cli.main(["poststage", "--store", str(d), "--type", "taxis"]) == 0
        a = spark.read.parquet(str(store / "taxis"))
        b = spark.read.parquet(str(d / "taxis"))
        assert a.count() == b.count() == N
        assert a.exceptAll(b).count() == 0  # two-phase == one-phase

    def test_poststage_nothing_staged(self, tmp_path):
        with pytest.raises(SystemExit):
            cli.main(["poststage", "--store", str(tmp_path), "--type", "nope"])

    def test_kafkaingest_refused_offline(self, store):
        assert cli.main(["kafkaingest", "--store", str(store),
                         "--type", "taxis"]) == 2

    def test_clear(self, spark, tdrive_csv, tmp_path):
        d = tmp_path / "store3"
        assert cli.main(["stage", "--store", str(d), "--type", "t",
                         "--input", str(tdrive_csv), "--format", "tdrive"]) == 0
        assert cli.main(["clear", "--store", str(d), "--type", "t"]) == 0
        assert not (d / "_staged" / "t").exists()

    def test_geojson_extent_ingest(self, spark, tmp_path):
        feats = [
            {"type": "Feature", "id": f"z{i}",
             "geometry": {"type": "Polygon", "coordinates":
                          [[[i, 0], [i + 1, 0], [i + 1, 1], [i, 1], [i, 0]]]},
             "properties": {"name": f"zone{i}"}}
            for i in range(6)
        ]
        src = tmp_path / "zones.geojsonl"
        src.write_text("\n".join(json.dumps(f) for f in feats) + "\n")
        d = tmp_path / "storeg"
        assert cli.main(["localingest", "--store", str(d), "--type", "zones",
                         "--input", str(src), "--format", "geojson"]) == 0
        df = spark.read.parquet(str(d / "zones"))
        # tiered insertion cells: >= one row per feature, bbox columns real
        assert df.select("feature_id").distinct().count() == 6
        assert {"cell", "tier", "minx", "maxx", "geom_wkt"} <= set(df.columns)
        row = df.filter(F.col("feature_id") == "z0").first()
        assert (row.minx, row.maxx) == (0.0, 1.0)


BOX = {"west": -10.0, "east": 25.0, "south": -20.0, "north": 15.0}


def _expected_box_count(spark, store):
    df = spark.read.parquet(str(store / "taxis"))
    return df.filter(
        (F.col("lon") >= BOX["west"]) & (F.col("lon") <= BOX["east"])
        & (F.col("lat") >= BOX["south"]) & (F.col("lat") <= BOX["north"])
    ).count()


class TestQueries:
    def test_bbox_matches_direct_filter(self, spark, store, capsys, tmp_path):
        out = tmp_path / "hits"
        rc = cli.main([
            "bbox", "--store", str(store), "--type", "taxis",
            "--west", str(BOX["west"]), "--east", str(BOX["east"]),
            "--south", str(BOX["south"]), "--north", str(BOX["north"]),
            "--output", str(out),
        ])
        assert rc == 0
        expect = _expected_box_count(spark, store)
        assert expect > 0
        assert spark.read.parquet(str(out)).count() == expect
        assert f"Got {expect} results" in capsys.readouterr().out

    def test_bbox_use_aggregation_same_count(self, spark, store, capsys):
        rc = cli.main([
            "bbox", "--store", str(store),  # --type omitted: sole type
            "--west", str(BOX["west"]), "--east", str(BOX["east"]),
            "--south", str(BOX["south"]), "--north", str(BOX["north"]),
            "--useAggregation",
        ])
        assert rc == 0
        expect = _expected_box_count(spark, store)
        assert f"Got {expect} results" in capsys.readouterr().out

    CQL = ("BBOX(geom, -10, -20, 25, 15) AND "
           "ts DURING 2021-06-01T00:00:00Z/2021-06-01T23:59:59Z")

    def _expected_cql_count(self, spark, store):
        df = spark.read.parquet(str(store / "taxis"))
        return df.filter(
            (F.col("lon") >= -10) & (F.col("lon") <= 25)
            & (F.col("lat") >= -20) & (F.col("lat") <= 15)
            & (F.col("ts") > "2021-06-01 00:00:00")
            & (F.col("ts") < "2021-06-01 23:59:59")
        ).count()

    def test_client_and_server_cql_agree(self, spark, store, capsys):
        """The reference's stated purpose for clientCql: consistency
        checking against the server-side path."""
        expect = self._expected_cql_count(spark, store)
        assert expect > 0
        assert cli.main(["clientCql", "--store", str(store),
                         "--cql", self.CQL]) == 0
        client_out = capsys.readouterr().out
        assert cli.main(["serverCql", "--store", str(store),
                         "--cql", self.CQL, "--ts-col", "ts"]) == 0
        server_out = capsys.readouterr().out
        assert f"Got {expect} results" in client_out
        assert f"Got {expect} results" in server_out
        assert "route:" in server_out

    def test_fullscan_both_legs(self, store, capsys):
        assert cli.main(["fullscan", "--store", str(store)]) == 0
        assert f"Got {N} results" in capsys.readouterr().out
        assert cli.main(["fullscanMinimal", "--store", str(store)]) == 0
        assert f"Got {N} results" in capsys.readouterr().out


class TestStats:
    def test_recalc_and_dump(self, spark, store, capsys):
        sidecar = store / "taxis" / "_stats.json"
        before = json.loads(sidecar.read_text())
        sidecar.unlink()
        assert cli.main(["stats", "--store", str(store),
                         "--type", "taxis"]) == 0
        after = json.loads(sidecar.read_text())
        assert after["total_rows"] == N
        assert after == before  # recalc from same data is deterministic
        assert cli.main(["dumpstats", "--store", str(store)]) == 0
        out = capsys.readouterr().out
        assert f"total_rows={N}" in out
        assert "row_range_histogram" in out

    def test_missing_type_resolution_errors(self, tmp_path):
        with pytest.raises(SystemExit):
            cli.main(["dumpstats", "--store", str(tmp_path)])


class TestSplits:
    """The accsplits op family (AccumuloSplitsOperationCLIProvider.java):
    each op rewrites the type's file splits; rows and stats must survive."""

    @pytest.fixture()
    def own_store(self, tdrive_csv, tmp_path):
        d = tmp_path / "store_splits"
        assert cli.main([
            "localingest", "--store", str(d), "--type", "taxis",
            "--input", str(tdrive_csv), "--format", "tdrive",
        ]) == 0
        return d

    @staticmethod
    def _tier_files(table_dir):
        tiers = [p for p in table_dir.iterdir() if p.name.startswith("tier=")]
        assert len(tiers) == 1
        return list(tiers[0].glob("*.parquet"))

    def test_splitquantile_rewrites_preserving_rows(self, spark, own_store,
                                                    capsys):
        before = {tuple(r) for r in
                  spark.read.parquet(str(own_store / "taxis")).collect()}
        assert cli.main(["splitquantile", "--store", str(own_store),
                         "--num", "3"]) == 0
        assert "into 3 splits (quantile)" in capsys.readouterr().out
        assert len(self._tier_files(own_store / "taxis")) == 3
        after = {tuple(r) for r in
                 spark.read.parquet(str(own_store / "taxis")).collect()}
        assert after == before
        # stats sidecar refreshed alongside (AbstractAccumuloSplitsOperation
        # keeps the store queryable afterwards)
        assert (own_store / "taxis" / "_stats.json").exists()
        assert json.loads(
            (own_store / "taxis" / "_stats.json").read_text()
        )["total_rows"] == N

    def test_presplitpartitionid_and_equalinterval(self, own_store, capsys):
        assert cli.main(["presplitpartitionid", "--store", str(own_store),
                         "--num", "4"]) == 0
        assert "into 4 splits (hash)" in capsys.readouterr().out
        assert len(self._tier_files(own_store / "taxis")) == 4
        assert cli.main(["splitequalinterval", "--store", str(own_store),
                         "--num", "2"]) == 0
        assert "(equal_interval)" in capsys.readouterr().out
        assert len(self._tier_files(own_store / "taxis")) <= 2

    def test_splitnumrecords_derives_split_count(self, own_store, capsys):
        # --num is entries PER split: 400 rows / 100 per split -> 4 splits
        assert cli.main(["splitnumrecords", "--store", str(own_store),
                         "--num", "100"]) == 0
        assert "into 4 splits" in capsys.readouterr().out
        assert len(self._tier_files(own_store / "taxis")) == 4

    def test_leftover_temp_dirs_ignored_and_cleaned(self, own_store):
        """A crashed run's .__resplit debris must not pollute type
        resolution and must be swept by the next splits op."""
        (own_store / "taxis.__resplit").mkdir()
        # --type omitted: 'taxis' still resolves as the sole type
        assert cli.main(["dumpstats", "--store", str(own_store)]) == 0
        assert cli.main(["splitquantile", "--store", str(own_store),
                         "--num", "2"]) == 0
        assert not (own_store / "taxis.__resplit").exists()
        assert not (own_store / "taxis.__old").exists()

    def test_num_must_be_positive(self, own_store):
        with pytest.raises(SystemExit, match="positive"):
            cli.main(["splitnumrecords", "--store", str(own_store),
                      "--num", "0"])


class TestAnalytics:
    """The analytic op family (MapReduceAnalyticOperationCLIProvider.java):
    each CLI run is checked against the direct operator API or a brute-force
    recomputation, the same consistency-twin standard as the query ops."""

    def test_kmeansparallel(self, spark, store, tmp_path, capsys):
        out = tmp_path / "km"
        assert cli.main(["kmeansparallel", "--store", str(store),
                         "--k", "3", "--output", str(out)]) == 0
        txt = capsys.readouterr().out
        assert "centroid 0:" in txt and "centroid 2:" in txt
        assign = spark.read.parquet(str(out))
        assert assign.count() == N
        assert assign.select("cluster").distinct().count() == 3
        assert assign.filter(F.col("dist_sq") < 0).count() == 0

    def test_kmeansjump_picks_k_in_range(self, spark, store, tmp_path, capsys):
        out = tmp_path / "kj"
        assert cli.main(["kmeansjump", "--store", str(store), "--kmin", "2",
                         "--kmax", "3", "--output", str(out)]) == 0
        txt = capsys.readouterr().out
        assert "best k=" in txt
        k = int(txt.split("best k=")[1].split()[0])
        assert 2 <= k <= 3
        assign = spark.read.parquet(str(out))
        assert assign.count() == N
        assert assign.select("cluster").distinct().count() == k

    def test_dbscan(self, spark, store, tmp_path, capsys):
        out = tmp_path / "db"
        assert cli.main(["dbscan", "--store", str(store), "--eps", "3.0",
                         "--minpts", "3", "--output", str(out)]) == 0
        res = spark.read.parquet(str(out))
        n_pts, n_clusters = res.count(), res.select("cluster").distinct().count()
        assert 0 < n_pts <= N and 0 < n_clusters < n_pts
        assert f"{n_pts} clustered points in {n_clusters} clusters" \
            in capsys.readouterr().out

    def test_nn_matches_bruteforce(self, spark, store, tmp_path):
        import numpy as np

        out = tmp_path / "nn"
        d = 2.5
        assert cli.main(["nn", "--store", str(store), "--distance", str(d),
                         "--output", str(out)]) == 0
        pdf = spark.read.parquet(str(store / "taxis")).select("lon", "lat").toPandas()
        xy = pdf[["lon", "lat"]].to_numpy()
        d2 = ((xy[:, None, :] - xy[None, :, :]) ** 2).sum(axis=2)
        expect = int((d2 <= d * d).sum()) - len(xy)  # ordered pairs, no self
        assert expect > 0
        assert spark.read.parquet(str(out)).count() == expect

    def test_kde_matches_direct_operator(self, spark, store, tmp_path):
        from geowave_spark.operators.kde import kde_pyramid

        out = tmp_path / "kde"
        assert cli.main(["kde", "--store", str(store), "--minLevel", "1",
                         "--maxLevel", "3", "--tileSize", "2",
                         "--output", str(out)]) == 0
        got = spark.read.parquet(str(out))
        want = kde_pyramid(spark.read.parquet(str(store / "taxis")),
                           min_level=1, max_level=3, tile_size=2)
        assert got.count() == want.count()
        assert (got.agg(F.sum("weight_scaled")).collect()[0][0]
                == want.agg(F.sum("weight_scaled")).collect()[0][0])

    def test_raster_resize_preserves_posts(self, spark, store, tmp_path):
        src, out = tmp_path / "kde2", tmp_path / "resized"
        assert cli.main(["kde", "--store", str(store), "--minLevel", "1",
                         "--maxLevel", "3", "--tileSize", "2",
                         "--output", str(src)]) == 0
        assert cli.main(["raster-resize", "--input", str(src),
                         "--output", str(out), "--oldTileSize", "2",
                         "--newTileSize", "1"]) == 0
        a = spark.read.parquet(str(src))
        b = spark.read.parquet(str(out))
        # R7 invariant: post count and total weight survive re-tiling
        assert a.count() == b.count()
        assert (a.agg(F.sum("weight_scaled")).collect()[0][0]
                == b.agg(F.sum("weight_scaled")).collect()[0][0])


class TestSpatialStatsOps:
    """The round-4 spatial-stats/movement op family: each CLI run equals the
    direct operator API over the same store (the analytic-family standard)."""

    @pytest.fixture(scope="class")
    def geo_store(self, spark, tdrive_csv, tmp_path_factory):
        """A store holding a point type AND a polygon zone type."""
        d = tmp_path_factory.mktemp("cli_stats") / "store"
        assert cli.main(["localingest", "--store", str(d), "--type", "taxis",
                         "--input", str(tdrive_csv), "--format", "tdrive"]) == 0
        feats = [
            {"type": "Feature", "id": f"z{i}",
             "geometry": {"type": "Polygon", "coordinates":
                          [[[x0, y0], [x0 + 30, y0], [x0 + 30, y0 + 20],
                            [x0, y0 + 20], [x0, y0]]]},
             "properties": {}}
            for i, (x0, y0) in enumerate([(-60, -30), (-10, -10), (30, 5)])
        ]
        src = d.parent / "zones.geojsonl"
        src.write_text("\n".join(json.dumps(f) for f in feats) + "\n")
        assert cli.main(["localingest", "--store", str(d), "--type", "zones",
                         "--input", str(src), "--format", "geojson"]) == 0
        return d

    def test_gistar_matches_direct(self, spark, geo_store, tmp_path):
        from geowave_spark.operators.hotspot import gi_star

        out = tmp_path / "gi"
        assert cli.main(["gistar", "--store", str(geo_store), "--type", "taxis",
                         "--cellDeg", "5.0", "--output", str(out)]) == 0
        got = {tuple(r) for r in spark.read.parquet(str(out)).collect()}
        pts = spark.read.parquet(str(geo_store / "taxis"))
        want = {tuple(r) for r in gi_star(pts, cell_deg=5.0).collect()}
        assert got == want and got

    def test_moransi_prints_statistic(self, spark, geo_store, capsys):
        from geowave_spark.operators.hotspot import morans_i

        assert cli.main(["moransi", "--store", str(geo_store), "--type",
                         "taxis", "--cellDeg", "5.0"]) == 0
        txt = capsys.readouterr().out
        pts = spark.read.parquet(str(geo_store / "taxis"))
        row = morans_i(pts, cell_deg=5.0).collect()[0]
        assert f"I = {row.morans_i_ppm / 1e6:.6f}" in txt
        assert f"{row.n_cells} cells" in txt

    def test_idw_matches_direct(self, spark, geo_store, tmp_path):
        from geowave_spark.operators.interpolate import idw_grid

        out = tmp_path / "idw"
        assert cli.main(["idw", "--store", str(geo_store), "--type", "taxis",
                         "--cellDeg", "5.0", "--value-col", "lat",
                         "--output", str(out)]) == 0
        got = {tuple(r) for r in spark.read.parquet(str(out)).collect()}
        pts = spark.read.parquet(str(geo_store / "taxis"))
        want = {tuple(r) for r in idw_grid(pts, cell_deg=5.0, value_col="lat").collect()}
        assert got == want and got

    def test_geofence_matches_direct(self, spark, geo_store, tmp_path):
        from geowave_spark.operators.geofence import geofence_transitions

        out = tmp_path / "gf"
        assert cli.main(["geofence", "--store", str(geo_store), "--type",
                         "taxis", "--zones-type", "zones",
                         "--entity-col", "track_id", "--ts-col", "ts",
                         "--output", str(out)]) == 0
        got = spark.read.parquet(str(out))
        # direct twin with the same synthesized ping id
        pts = spark.read.parquet(str(geo_store / "taxis")).withColumn(
            "fid", F.md5(F.concat_ws("|", "track_id", "ts", "lon", "lat"))
        )
        zones = spark.read.parquet(str(geo_store / "zones")).withColumnRenamed(
            "feature_id", "zone_id"
        )
        want = geofence_transitions(pts, zones, entity_col="track_id", ts_col="ts")
        assert {tuple(r) for r in got.collect()} == {tuple(r) for r in want.collect()}
        assert got.count() > 0
        assert {r.kind for r in got.collect()} <= {"enter", "exit", "switch"}

    def test_trackstats_and_staypoints_over_linestring_store(
        self, spark, tmp_path
    ):
        from geowave_spark.operators.trajectory import staypoints, track_stats

        feats = [
            {"type": "Feature", "id": "t0",
             "geometry": {"type": "LineString",
                          "coordinates": [[0, 0], [3, 4], [3.01, 4.01],
                                          [3.02, 4.0], [10, 10]]},
             "properties": {}},
            {"type": "Feature", "id": "t1",
             "geometry": {"type": "LineString",
                          "coordinates": [[20, 20], [26, 28]]},
             "properties": {}},
        ]
        src = tmp_path / "tracks.geojsonl"
        src.write_text("\n".join(json.dumps(f) for f in feats) + "\n")
        d = tmp_path / "store"
        assert cli.main(["localingest", "--store", str(d), "--type", "tracks",
                         "--input", str(src), "--format", "geojson"]) == 0

        out = tmp_path / "ts"
        assert cli.main(["trackstats", "--store", str(d), "--type", "tracks",
                         "--output", str(out)]) == 0
        rows = {r.fid: r for r in spark.read.parquet(str(out)).collect()}
        assert rows["t0"].n_verts == 5 and rows["t1"].n_segs == 1
        assert rows["t1"].length_udeg == 10_000_000  # 6-8-10 triangle
        assert rows["t0"].duration_ms is None  # geojson tracks carry no ts
        tracks = spark.read.parquet(str(d / "tracks"))
        want = {
            r.fid: r for r in track_stats(tracks, fid_col="feature_id").collect()
        }
        assert {k: tuple(v) for k, v in rows.items()} == {
            k: tuple(v) for k, v in want.items()
        }

        out2 = tmp_path / "sp"
        assert cli.main(["staypoints", "--store", str(d), "--type", "tracks",
                         "--radius", "0.05", "--minRun", "3",
                         "--output", str(out2)]) == 0
        got = {(r.fid, r.anchor_idx) for r in spark.read.parquet(str(out2)).collect()}
        want2 = {
            (r.fid, r.anchor_idx)
            for r in staypoints(tracks, radius_deg=0.05, min_run=3,
                                fid_col="feature_id").collect()
        }
        assert got == want2
        assert ("t0", 1) in got  # the 3-vertex cluster around (3, 4)
