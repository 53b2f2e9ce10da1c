"""Arrow-batched pandas UDF factories.

Kept in a module WITHOUT ``from __future__ import annotations``:
pandas_udf infers the UDF's eval type from the *runtime* annotation
objects, and postponed evaluation turns them into strings it cannot
resolve (UNSUPPORTED_SIGNATURE).
"""

import numpy as np
import pandas as pd
from pyspark.sql.functions import pandas_udf


def make_lsh_signature_udf(planes_list, scale):
    """Vectorized sign-LSH signature over f64 fixed-point plane dots;
    see operators/similarity.py:pandas_lsh_signature for the exactness
    argument (every floored product is an integer < 2^41, a 64-element
    sum < 2^47 — f64 addition is exact and order-free)."""
    planes = np.array(planes_list, dtype=np.float64)

    @pandas_udf("string")
    def sig(v: pd.Series) -> pd.Series:
        if len(v) == 0:
            return pd.Series([], dtype=object)
        mat = np.vstack([np.asarray(x, dtype=np.float64) for x in v])
        cols = [
            np.where(np.floor(mat * planes[p] * scale).sum(axis=1) > 0, "1", "0")
            for p in range(len(planes))
        ]
        return pd.Series(["".join(bits) for bits in zip(*cols)])

    return sig
