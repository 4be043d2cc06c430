"""Guard for the LSH oracle twin's float-sign boundary (advisory r2).

`_ann_lsh_sql` claims byte-exactness with the Spark query because both sides
compute sign(embedding · hyperplane) over identical doubles — but the Spark
side sums via numpy matmul (SIMD/pairwise order) and DuckDB via a sequential
list_reduce fold. A projection NEAR ZERO could flip a bucket bit between the
two summation orders and fail the gate nondeterministically across BLAS
builds. This test asserts the fixed corpora keep every projection far from
zero, so any future sign disagreement is reported as an environment issue
here rather than a silent oracle-equality failure.
"""

from __future__ import annotations

import glob

import numpy as np
import pyarrow.parquet as pq
import pytest

from aqueduct_core_spark.functions.similarity import lsh_hyperplanes

# |dot| must clear this for every (vector, hyperplane): double rounding noise
# from a different summation order over 64 O(1) terms is ~1e-13, five orders
# of magnitude below the guard.
MIN_MARGIN = 1e-8


@pytest.mark.parametrize("sf", ["sf0.001", "sf0.01"])
def test_lsh_projections_clear_sign_margin(sf):
    from __spark_entry__ import ANN_NBITS, ANN_TABLES

    paths = glob.glob(f"/root/testdata/{sf}/embeddings.parquet")
    if not paths:
        pytest.skip(f"no testdata at {sf}")
    tbl = pq.read_table(paths[0], columns=["embedding"])
    E = np.array(tbl.column("embedding").to_pylist(), dtype=np.float64)
    H = np.array(lsh_hyperplanes(E.shape[1], ANN_NBITS, ANN_TABLES, seed=42),
                 dtype=np.float64)  # (tables, nbits, dim)
    dots = np.einsum("nd,tbd->ntb", E, H)
    margin = float(np.abs(dots).min())
    assert margin > MIN_MARGIN, (
        f"{sf}: a projection sits {margin} from zero — the DuckDB twin's "
        "sequential fold may disagree with numpy's summation order; "
        "regenerate hyperplanes (new seed) or treat gate failures as env"
    )
