"""IVF-PQ — the production ANN storage layout (FAISS's IVFPQ shape):
coarse IVF buckets for partition pruning × product-quantized codes for
in-bucket scanning.

The two levers compose multiplicatively at 100 TB: the IVF partition
prunes the SCAN to n_probe/n_centroids of the files (planner-enforced,
operators.similarity.write_ivf_index's argument), and inside the
probed buckets each vector is m bytes of PQ codes instead of d×4 of
floats (16–64× less IO), scored by asymmetric distance — per query a
(m × k) lookup table computed ONCE, then m table adds per candidate,
no float vector math in the scan. Exactness comes back at the end the
usual way: the shortlist reranks against full-precision vectors
(operators.similarity.rerank_exact), so compression errors inside the
shortlist cost nothing.

Index layout: ``<path>/bucket=<b>/`` parquet of (id, pq_codes
array<tinyint>) + ``_model/`` sidecar (centroids, codebooks, optional
OPQ rotation as .npz) committed with the engine's versioned-pointer
protocol — a crash never leaves a reader a half-written model.

Composes the engine's existing pieces (ivf_assign, train_pq_codebooks
/ train_opq, pq_encode, rerank_exact); this module only adds the
bucketed layout and the per-query probed-bucket ADC join.
"""

from __future__ import annotations

import os
import uuid
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from etl_sentinel_imagery_spark.operators.similarity import (
    _collect_query_batch,
    _pq_reconstruct,
    _train_subspace_books,
    ivf_assign,
    pq_encode,
    rerank_exact,
)


def _model_dir(path: str) -> str:
    return os.path.join(path, "_model")


def _save_model(
    path: str,
    centroids: np.ndarray,
    codebooks: np.ndarray,
    rotation: np.ndarray | None,
    residual: bool = False,
    flip: bool = True,
) -> str:
    """Write a NEW model version dir and return its name. Old versions
    stay on disk — a reader that resolved a pre-flip manifest may
    still need them; :func:`operators.similarity.vacuum_layout`
    reclaims them age-gated with the data generation they encode.
    ``flip=False`` defers the ``_CURRENT`` repoint to the caller
    (the rebuild leg flips the layout manifest FIRST so the fallback
    pointer never runs ahead of the published generation)."""
    mdir = _model_dir(path)
    os.makedirs(mdir, exist_ok=True)
    vname = f"v_{uuid.uuid4().hex[:8]}"
    vdir = os.path.join(mdir, vname)
    os.makedirs(vdir)
    np.savez(
        os.path.join(vdir, "model.npz"),
        centroids=centroids,
        codebooks=codebooks,
        rotation=(
            rotation if rotation is not None else np.zeros((0, 0))
        ),
        residual=np.array(residual),
    )
    if flip:
        _flip_model_current(path, vname)
    return vname


def _flip_model_current(path: str, vname: str) -> None:
    mdir = _model_dir(path)
    tmp = os.path.join(mdir, f"_CURRENT.tmp{vname}")
    with open(tmp, "w") as f:
        f.write(vname)
    os.replace(tmp, os.path.join(mdir, "_CURRENT"))


def load_model(path: str, meta=None):
    """Resolve the model CONSISTENT with the live codes generation:
    the layout manifest names the version its codes were encoded with
    (one pointer flip covers both — codes decoded against another
    generation's codebooks are garbage); ``_model/_CURRENT`` is the
    fallback for manifests predating the field.

    ``meta`` pins a pre-resolved ``_live_layout_meta`` snapshot — a
    caller that also reads the code files must resolve the manifest
    ONCE and hand the same snapshot to both (round-9 ADVICE: two
    independent resolutions let a concurrent rebuild flip pair codes
    with the wrong codebooks mid-call)."""
    from etl_sentinel_imagery_spark.operators.similarity import (
        live_layout_model,
    )

    # a pinned None (legacy manifest-less layout) and a fresh resolve
    # on the same layout both land on the _CURRENT fallback, so None
    # doubles as "resolve now" without ambiguity
    vname = live_layout_model(path) if meta is None else meta.get("model")
    if vname is None:
        with open(os.path.join(_model_dir(path), "_CURRENT")) as f:
            vname = f.read().strip()
    z = np.load(os.path.join(_model_dir(path), vname, "model.npz"))
    rot = z["rotation"]
    residual = bool(z["residual"]) if "residual" in z else False
    return (
        z["centroids"],
        z["codebooks"],
        rot if rot.size else None,
        residual,
    )


def train_residual_codebooks(
    embeddings: DataFrame,
    centroids: np.ndarray,
    m: int = 8,
    k: int = 16,
    n_iter: int = 10,
    vec_col: str = "embedding",
    sample_limit: int = 4096,
    opq: bool = False,
    n_outer: int = 6,
):
    """Codebooks over IVF RESIDUALS (x̂ − ĉ_bucket(x)) — the full FAISS
    IVFPQ construction: residuals concentrate around the origin once
    the coarse quantizer has explained the cluster structure, so the
    same m×k code budget spends its resolution on the part of the
    vector the bucket does NOT explain. Trained on the standard
    bounded deterministic sample.

    With ``opq=True`` the Ge-et-al alternation additionally learns an
    orthogonal rotation OF THE RESIDUAL SPACE (codebooks ↔ Procrustes
    solve) and the return value becomes ``(rotation, codebooks)`` —
    the final FAISS IVFPQ refinement; plain mode returns codebooks
    alone (back-compat)."""
    cent = centroids / np.linalg.norm(centroids, axis=1, keepdims=True)
    rows = (
        embeddings.orderBy("vec_id").limit(sample_limit).select(vec_col).collect()
    )
    mat = np.array([r[vec_col] for r in rows], dtype="float64")
    mat = mat / np.linalg.norm(mat, axis=1, keepdims=True)
    assign = np.argmax(mat @ cent.T, axis=1)
    res = mat - cent[assign]
    if not opq:
        return _train_subspace_books(res, m, k, n_iter)
    d = res.shape[1]
    rot = np.eye(d)
    for _ in range(n_outer):
        y = res @ rot
        books = _train_subspace_books(y, m, k, n_iter)
        q = _pq_reconstruct(y, books)
        u, _sv, vt = np.linalg.svd(res.T @ q)
        rot = u @ vt
    books = _train_subspace_books(res @ rot, m, k, n_iter)
    return rot, books


def _encode_residual(
    embeddings: DataFrame,
    centroids: np.ndarray,
    codebooks: np.ndarray,
    id_col: str,
    vec_col: str,
    rotation: np.ndarray | None = None,
) -> DataFrame:
    """One Arrow pass: normalize → assign bucket → subtract its
    centroid → per-subspace argmin codes. Emits (id, pq_codes, bucket)
    directly (no assignment join — residual encoding needs the bucket
    anyway)."""
    cent = centroids / np.linalg.norm(centroids, axis=1, keepdims=True)
    m, kk, sub = codebooks.shape

    def _enc(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            mat = np.stack(pdf[vec_col].map(np.asarray)).astype("float64")
            mat = mat / np.linalg.norm(mat, axis=1, keepdims=True)
            buckets = np.argmax(mat @ cent.T, axis=1)
            res = mat - cent[buckets]
            if rotation is not None:
                res = res @ rotation
            codes = np.zeros((len(mat), m), dtype="int8")
            for j in range(m):
                x = res[:, j * sub : (j + 1) * sub]
                d2 = ((x[:, None, :] - codebooks[j][None, :, :]) ** 2).sum(
                    axis=2
                )
                codes[:, j] = np.argmin(d2, axis=1).astype("int8")
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    "pq_codes": list(codes),
                    "bucket": buckets.astype("int32"),
                }
            )

    return embeddings.select(id_col, vec_col).mapInPandas(
        _enc, schema=f"{id_col} bigint, pq_codes array<tinyint>, bucket int"
    )


def write_ivfpq_index(
    embeddings: DataFrame,
    centroids: np.ndarray,
    codebooks: np.ndarray,
    path: str,
    rotation: np.ndarray | None = None,
    residual: bool = False,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> None:
    """Encode + bucket + persist (codes: array<tinyint>, values
    0..k-1 — pq_encode's layout). ``residual=True`` encodes x̂ − ĉ_b
    with codebooks from :func:`train_residual_codebooks`; a
    ``rotation`` alongside it must come from that trainer's
    ``opq=True`` mode (it rotates the RESIDUAL space before the
    subspace split)."""
    from etl_sentinel_imagery_spark.operators.similarity import (
        list_layout_data_files,
        publish_layout_manifest,
    )

    enc = _encode_full(
        embeddings, centroids, codebooks, rotation, residual,
        id_col, vec_col,
    )
    enc.write.mode("overwrite").partitionBy("bucket").parquet(path)
    vname = _save_model(path, centroids, codebooks, rotation, residual)
    # versioned-pointer layout like the IVF tier: readers resolve a
    # committed generation, maintenance flips it atomically; the
    # manifest names the model version so codes + codebooks are one
    # generation under one pointer
    publish_layout_manifest(
        path, list_layout_data_files(path), model=vname
    )


def _encode_full(
    embeddings: DataFrame,
    centroids: np.ndarray,
    codebooks: np.ndarray,
    rotation: np.ndarray | None,
    residual: bool,
    id_col: str,
    vec_col: str,
) -> DataFrame:
    """The (id, pq_codes, bucket) encode plan for EXPLICIT model
    params — shared by the initial build (overwrite into a fresh dir)
    and the retrain rebuild (append as a new generation)."""
    if residual:
        return _encode_residual(
            embeddings, centroids, codebooks, id_col, vec_col, rotation
        )
    enc = pq_encode(embeddings, codebooks, id_col, vec_col, rotation)
    assigned = ivf_assign(embeddings, centroids, id_col, vec_col).select(
        id_col, "bucket"
    )
    return enc.join(assigned, id_col)


def rebuild_ivfpq_index(
    embeddings: DataFrame,
    centroids: np.ndarray,
    codebooks: np.ndarray,
    path: str,
    rotation: np.ndarray | None = None,
    residual: bool = False,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> None:
    """Retrain-rebuild an EXISTING layout without ever deleting the
    live generation in place (round-8 ADVICE: the old path's
    ``mode("overwrite")`` tore ``_layout``/``_model`` out from under
    concurrent readers). Mirrors the graph tier's
    ``_persist_graph_versioned``: (1) the new model version lands as a
    new ``_model/v_*`` dir with NO pointer change, (2) re-encoded
    codes land as NEW files via ``mode("append")``, (3) ONE
    :func:`publish_layout_manifest` flip — carrying the model version
    — makes codes + codebooks visible together, (4) ``_model/_CURRENT``
    repoints last (fallback for pre-field manifests only, so it must
    never run ahead of the flip). A reader mid-scan holds the old
    complete generation — data files AND model dir — until
    :func:`operators.similarity.vacuum_layout`'s retirement age gate
    reclaims both."""
    from etl_sentinel_imagery_spark.operators.similarity import (
        list_layout_data_files,
        publish_layout_manifest,
    )

    vname = _save_model(
        path, centroids, codebooks, rotation, residual, flip=False
    )
    before = set(list_layout_data_files(path))
    enc = _encode_full(
        embeddings, centroids, codebooks, rotation, residual,
        id_col, vec_col,
    )
    enc.write.mode("append").partitionBy("bucket").parquet(path)
    new_files = [
        f for f in list_layout_data_files(path) if f not in before
    ]
    # re-stamp the model dir NOW (round-9 ADVICE): its mtime was set
    # when _save_model wrote it, BEFORE the encode — a large-corpus
    # encode outlasting vacuum_layout's min_age gate would let a
    # concurrent vacuum see an "old" unreferenced v_* dir and rmtree
    # the model this very publish is about to name. Touching just
    # before the flip shrinks that window to the flip itself (and
    # vacuum's gate also keys off the newest file INSIDE the dir).
    try:
        vdir = os.path.join(_model_dir(path), vname)
        os.utime(vdir)
        for fn in os.listdir(vdir):
            os.utime(os.path.join(vdir, fn))
    except OSError:
        pass
    publish_layout_manifest(path, new_files, model=vname)
    _flip_model_current(path, vname)


def ivfpq_encode(
    embeddings: DataFrame,
    path: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Encode vectors with an EXISTING index's frozen model (centroids,
    codebooks, rotation, residual flag) into the layout's
    (id, pq_codes, bucket) shape — the incremental-maintenance encode:
    codebooks stay immutable between rebuilds, so a vector's codes are
    a pure function of the vector, and survivors of a bucket rewrite
    can carry their codes verbatim (re-encoding them would reproduce
    the same bytes)."""
    centroids, codebooks, rotation, residual = load_model(path)
    if residual:
        return _encode_residual(
            embeddings, centroids, codebooks, id_col, vec_col, rotation
        )
    enc = pq_encode(embeddings, codebooks, id_col, vec_col, rotation)
    assigned = ivf_assign(embeddings, centroids, id_col, vec_col).select(
        id_col, "bucket"
    )
    return enc.join(assigned, id_col)


def ivfpq_topk(
    spark: SparkSession,
    index_path: str,
    queries_df: DataFrame,
    k: int = 5,
    n_probe: int = 2,
    shortlist: int | None = None,
    embeddings: DataFrame | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Per-query probed-bucket ADC search; with ``embeddings`` the
    shortlist reranks to exact cosine (the two-stage deployment),
    otherwise returns the raw ADC ranking (adc_dist ascending).

    Queries collect driver-side (the small side by construction); each
    query's (m × k) distance LUT broadcasts into the pruned scan; the
    scan touches ONLY probed bucket partitions (IN-filter on the
    partition column) and ONLY the m-byte codes.

    The live manifest is resolved ONCE and pinned for both the model
    and the code-file list (round-9 ADVICE: a rebuild flip landing
    between two independent resolutions paired one generation's codes
    with another's codebooks — silently-garbage ADC distances for the
    whole batch)."""
    from etl_sentinel_imagery_spark.operators.similarity import (
        _live_layout_meta,
    )

    pinned_meta = _live_layout_meta(index_path)
    centroids, codebooks, rotation, residual = load_model(
        index_path, meta=pinned_meta
    )
    m, kk, sub = codebooks.shape
    cent = centroids / np.linalg.norm(centroids, axis=1, keepdims=True)
    shortlist = shortlist or 4 * k

    q_rows = _collect_query_batch(queries_df, id_col, vec_col)
    q_ids = [int(r[id_col]) for r in q_rows]
    q_mat = np.stack(
        [np.asarray(r[vec_col], dtype="float64") for r in q_rows]
    )
    qn = q_mat / np.linalg.norm(q_mat, axis=1, keepdims=True)
    probes = np.argsort(-(qn @ cent.T), axis=1)[:, :n_probe]
    probe_set = sorted({int(b) for row in probes for b in row})

    pairs = [
        (int(qid), int(b)) for i, qid in enumerate(q_ids) for b in probes[i]
    ]
    qry = spark.createDataFrame(pairs, "query_id bigint, bucket int")
    if residual:
        # per-(query, probed-bucket) LUTs over the residual target
        # q̂ − ĉ_b: ||q̂ − (ĉ_b + r)||² = Σ_j LUT_qb[j][code_j].
        # n_queries × n_probe LUTs of (m × k) doubles — control-plane.
        lut_by_qb = {}
        for i, qid in enumerate(q_ids):
            for b in probes[i]:
                tgt = qn[i] - cent[int(b)]
                if rotation is not None:
                    tgt = tgt @ rotation
                lut = np.empty((m, kk))
                for j in range(m):
                    seg = tgt[j * sub : (j + 1) * sub]
                    lut[j] = ((codebooks[j] - seg[None, :]) ** 2).sum(axis=1)
                lut_by_qb[(int(qid), int(b))] = lut
    else:
        # per-query LUTs over the (rotated) normalized query
        q_enc = qn @ rotation if rotation is not None else qn  # pq_encode applies mat @ rotation
        luts = np.empty((len(q_ids), m, kk))
        for j in range(m):
            seg = q_enc[:, j * sub : (j + 1) * sub]
            diff = seg[:, None, :] - codebooks[j][None, :, :]
            luts[:, j, :] = np.einsum("qkd,qkd->qk", diff, diff)
        lut_by_qid = {int(qid): luts[i] for i, qid in enumerate(q_ids)}

    from etl_sentinel_imagery_spark.operators.similarity import (
        read_indexed_layout,
    )

    codes = read_indexed_layout(
        spark, index_path, meta=pinned_meta
    ).filter(F.col("bucket").isin(probe_set))
    cand = codes.join(F.broadcast(qry), "bucket").select(
        "query_id",
        F.col(id_col).alias("cand_id"),
        F.col("pq_codes").alias("codes"),
        "bucket",
    )

    def _adc(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                yield pd.DataFrame(
                    {"query_id": [], "cand_id": [], "adc_dist": []}
                )
                continue
            code_mat = np.stack(pdf["codes"].map(np.asarray)).astype("int64")
            dists = np.empty(len(pdf))
            qids = pdf["query_id"].to_numpy()
            cols = np.arange(m)
            if residual:
                bks = pdf["bucket"].to_numpy()
                keys = qids.astype("int64") * 1_000_000 + bks
                for key in np.unique(keys):
                    sel = keys == key
                    lut = lut_by_qb[(int(key // 1_000_000), int(key % 1_000_000))]
                    dists[sel] = lut[cols, code_mat[sel]].sum(axis=1)
            else:
                for qid in np.unique(qids):
                    sel = qids == qid
                    lut = lut_by_qid[int(qid)]
                    dists[sel] = lut[cols, code_mat[sel]].sum(axis=1)
            yield pd.DataFrame(
                {
                    "query_id": pdf["query_id"],
                    "cand_id": pdf["cand_id"],
                    "adc_dist": dists,
                }
            )

    scored = cand.mapInPandas(
        _adc, schema="query_id bigint, cand_id bigint, adc_dist double"
    ).filter(F.col("cand_id") != F.col("query_id"))
    w = Window.partitionBy("query_id").orderBy(
        F.asc("adc_dist"), F.asc("cand_id")
    )
    short = scored.withColumn("rnk", F.row_number().over(w)).filter(
        F.col("rnk") <= (shortlist if embeddings is not None else k)
    )
    if embeddings is None:
        return short.select("query_id", "cand_id", "adc_dist", "rnk")
    return rerank_exact(
        short.select("query_id", "cand_id"),
        embeddings,
        k=k,
        id_col=id_col,
        vec_col=vec_col,
    )
