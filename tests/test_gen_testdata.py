"""tools/gen_testdata.py parity: the self-generated scaling slices
(SCALE.md §11) must stay schema-identical to the driver's read-only
testdata — column names, arrow types, and table set — otherwise the
measured exponents stop describing the engine the driver runs.  Tiny
sf so the test is seconds; no Spark session needed."""

from __future__ import annotations

import pyarrow.parquet as pq

import tools.gen_testdata as gen

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def test_generated_slice_matches_driver_schema(tmp_path, monkeypatch):
    monkeypatch.setattr(gen, "ROOT", str(tmp_path))
    gen.gen_sf(0.001)
    out = tmp_path / "sf0.001"
    for t in TABLES:
        mine = pq.read_schema(out / f"{t}.parquet")
        driver = pq.read_schema(f"/root/testdata/sf0.001/{t}.parquet")
        assert mine.names == driver.names, (t, mine.names, driver.names)
        for name in mine.names:
            mt, dt = mine.field(name).type, driver.field(name).type
            # the driver writes TIMESTAMP(NANOS); micro-vs-nano
            # precision does not change any measured plan (both read
            # as timestamps under the engine's session confs)
            if str(dt).startswith("timestamp") and str(mt).startswith(
                "timestamp"
            ):
                continue
            assert mt == dt, (t, name, mt, dt)
    # deterministic: same seed, same bytes-level row count
    n = pq.read_metadata(out / "lineitem.parquet").num_rows
    assert n == 6_000
