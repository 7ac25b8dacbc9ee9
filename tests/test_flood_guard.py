"""Planted-duplicate-flood tests for the banded near-dup paths (VERDICT r4
item 1): the classic real-crawl skew-killer — thousands of copies / near-
copies of one boilerplate page sharing every LSH band key — must neither
blow up candidate generation (k²/2 pairs in one bucket) nor silently
diverge from the oracle, and the dropped mass must be observable.

Fixture: the benign sf0.001 corpus (500 docs / 500 vectors, near-unique)
plus
  - an EXACT flood: 1,000 byte-identical copies of one benign page
    (collapsed to the benign representative before signatures), and
  - a NEAR flood: 1,500 one-token variants of a boilerplate page (distinct
    texts, so the collapse keeps them; their shared band buckets exceed the
    frequency caps and are dropped), and, on the embedding side, 700
    epsilon-perturbed copies of one vector (same hyperplane signs — one
    700-deep bucket in every band) plus 300 byte-identical vector copies.
"""

from __future__ import annotations

import duckdb
import numpy as np
import pandas as pd
import pytest

from skyline_spark.catalog import QUERIES
from tests.test_catalog import _rows

SRC = "/root/testdata/sf0.001"

EXACT_COPY_BASE = 100_000     # doc_ids of the byte-identical copies
NEAR_FLOOD_BASE = 200_000     # doc_ids of the one-token variants
N_EXACT, N_NEAR = 1_000, 1_500
EMB_EXACT_BASE, EMB_NEAR_BASE = 100_000, 200_000
N_EMB_EXACT, N_EMB_NEAR = 300, 700

BOILER = (
    "breaking news widget gadget portal home about contact privacy terms "
    "subscribe newsletter login register search trending popular latest "
    "sports business technology science health entertainment weather "
    "copyright all rights reserved follow us on social media cookie policy"
)


@pytest.fixture(scope="module")
def flood_dir(spark, tmp_path_factory):
    out = tmp_path_factory.mktemp("flood")
    con = duckdb.connect()
    docs = con.execute(
        f"SELECT * FROM read_parquet('{SRC}/documents.parquet')"
    ).fetchdf()
    base_text = docs.loc[docs.doc_id == 0, "text"].iloc[0]
    exact = pd.DataFrame(
        {
            "doc_id": np.arange(EXACT_COPY_BASE, EXACT_COPY_BASE + N_EXACT),
            "text": base_text,
            "lang": "en",
            "source": "flood",
            "n_chars": len(base_text),
        }
    )
    near = pd.DataFrame(
        {
            "doc_id": np.arange(NEAR_FLOOD_BASE, NEAR_FLOOD_BASE + N_NEAR),
            "text": [f"{BOILER} article{i:05d}" for i in range(N_NEAR)],
            "lang": "en",
            "source": "flood",
            "n_chars": len(BOILER) + 13,
        }
    )
    all_docs = pd.concat([docs, exact, near], ignore_index=True)

    embs = con.execute(
        f"SELECT * FROM read_parquet('{SRC}/embeddings.parquet')"
    ).fetchdf()
    base_vec = np.array(embs.loc[embs.vec_id == 0, "embedding"].iloc[0], dtype=np.float32)
    # epsilon perturbations far below any hyperplane-dot magnitude: every
    # variant keeps the SAME 8 band values -> one 700-deep bucket per band
    near_vecs = []
    for i in range(N_EMB_NEAR):
        v = base_vec.copy()
        v[i % 64] += np.float32((i % 97 + 1) * 1e-6)
        near_vecs.append(v.tolist())
    emb_near = pd.DataFrame(
        {
            "vec_id": np.arange(EMB_NEAR_BASE, EMB_NEAR_BASE + N_EMB_NEAR),
            "embedding": near_vecs,
            "label": 0,
        }
    )
    other_vec = np.array(embs.loc[embs.vec_id == 1, "embedding"].iloc[0], dtype=np.float32)
    emb_exact = pd.DataFrame(
        {
            "vec_id": np.arange(EMB_EXACT_BASE, EMB_EXACT_BASE + N_EMB_EXACT),
            "embedding": [other_vec.tolist()] * N_EMB_EXACT,
            "label": 0,
        }
    )
    all_embs = pd.concat([embs, emb_near, emb_exact], ignore_index=True)

    con.execute("CREATE TABLE d AS SELECT * FROM all_docs")
    con.execute(
        "CREATE TABLE e AS SELECT vec_id, embedding::FLOAT[] AS embedding, label FROM all_embs"
    )
    con.execute(f"COPY d TO '{out}/documents.parquet' (FORMAT PARQUET)")
    con.execute(f"COPY e TO '{out}/embeddings.parquet' (FORMAT PARQUET)")
    con.close()
    return str(out)


@pytest.fixture(scope="module")
def oracle_con(flood_dir):
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{flood_dir}/documents.parquet'"
    )
    con.execute(
        f"CREATE VIEW embeddings AS SELECT * FROM '{flood_dir}/embeddings.parquet'"
    )
    return con


GUARDED = ["dedup_minhash_lsh", "dedup_simhash", "dedup_embedding_lsh", "dedup_band_guard"]


@pytest.fixture(scope="module")
def results(spark, flood_dir):
    return {n: QUERIES[n].build(spark, flood_dir).collect() for n in GUARDED}


def test_exact_flood_collapses_to_representative(results):
    """Byte-identical copies never reach the band join: no output pair may
    involve a copy id (their representative is the original benign doc)."""
    for name in ("dedup_minhash_lsh", "dedup_simhash"):
        ids = {
            i
            for r in results[name]
            for i in (r["doc_a"], r["doc_b"])
        }
        flood_ids = {i for i in ids if EXACT_COPY_BASE <= i < EXACT_COPY_BASE + N_EXACT}
        assert not flood_ids, f"{name}: exact copies leaked into the pair set"
    emb_ids = {
        i
        for r in results["dedup_embedding_lsh"]
        for i in (r["vec_a"], r["vec_b"])
    }
    assert not any(EMB_EXACT_BASE <= i < EMB_EXACT_BASE + N_EMB_EXACT for i in emb_ids)


def test_candidate_volume_bounded(results):
    """The flood must not quadratically explode the pair output: k = 1,500
    near-variants alone would be ~1.1M pairs un-guarded; with the capped
    band buckets the whole output stays orders of magnitude below that."""
    for name in ("dedup_minhash_lsh", "dedup_simhash", "dedup_embedding_lsh"):
        assert len(results[name]) < 100_000, (
            f"{name}: {len(results[name])} pairs — flood not contained"
        )


def test_dropped_mass_is_observable(results):
    """dedup_band_guard reports the flood: the collapse ratio (n_items vs
    n_reps) and a nonzero capped bucket mass for the flooded families."""
    guard = {r["family"]: r for r in results["dedup_band_guard"]}
    m = guard["minhash"]
    assert m["n_items"] == 500 + N_EXACT + N_NEAR
    assert m["n_reps"] == 500 + N_NEAR  # exact copies collapsed
    assert m["capped_items"] > 0, "minhash flood bucket not reported"
    e = guard["embedding"]
    assert e["n_items"] == 500 + N_EMB_EXACT + N_EMB_NEAR
    assert e["n_reps"] == 500 + N_EMB_NEAR
    assert e["capped_items"] >= N_EMB_NEAR, "embedding flood bucket not reported"
    s = guard["simhash"]
    assert s["n_reps"] == 500 + N_NEAR
    assert s["max_bucket"] >= N_NEAR // 2  # the near flood concentrates


@pytest.mark.parametrize("name", GUARDED)
def test_oracle_parity_on_flood(spark, flood_dir, oracle_con, results, name):
    """Hash-level parity against the DuckDB oracle ON THE FLOOD FIXTURE —
    the benign portion of the pair set survives the guard bit-identically
    (the driver's sf0.01 gate never exercises these code paths)."""
    spec = QUERIES[name]
    sdf = QUERIES[name].build(spark, flood_dir)
    srows, scols = _rows(sdf.columns, [tuple(r) for r in results[name]])
    rel = oracle_con.sql(spec.oracle)
    drows, dcols = _rows([d[0] for d in rel.description], rel.fetchall())
    assert scols == dcols
    assert srows == drows
