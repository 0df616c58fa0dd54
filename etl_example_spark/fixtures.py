"""Deterministic synthetic reference-star-schema fixtures (FIXTURES.md).

Generates the chains/stores/products/sellout tables with the reference's
dirty-data characteristics: slash-format date strings, negative/zero
quantities, optional NULL and >1,000,000 outliers (the two predicate
branches the reference data never exercises, src/job.py:225), duplicate
(store_id, product_id, daily) keys that must be kept, and a product name
containing an apostrophe (ddl/products.sql:11).
"""

from __future__ import annotations

import numpy as np
import pandas as pd

SEED = 42


def make_reference_tables(
    n_fact: int = 20_000,
    n_chains: int = 10,
    n_stores: int = 400,
    n_products: int = 80,
    frac_negative: float = 0.013,
    frac_zero: float = 0.05,
    frac_null: float = 0.002,
    frac_huge: float = 0.001,
    frac_dup: float = 0.011,
    seed: int = SEED,
) -> dict[str, pd.DataFrame]:
    rng = np.random.default_rng(seed)

    chains = pd.DataFrame(
        {
            "chain_id": np.arange(1, n_chains + 1, dtype="int32"),
            "chain_name": [f"Chain {i:02d}" for i in range(1, n_chains + 1)],
        }
    )
    stores = pd.DataFrame(
        {
            "chain_id": rng.integers(1, n_chains + 1, n_stores).astype("int32"),
            "store_id": np.arange(1, n_stores + 1, dtype="int32"),
            "store_name": [f"{100 + i} Example St" for i in range(n_stores)],
        }
    )
    product_names = [f"Product {i:03d}" for i in range(1, n_products + 1)]
    product_names[3] = "Cooper's Test Product"  # apostrophe case
    products = pd.DataFrame(
        {
            "product_id": np.arange(1, n_products + 1, dtype="int32"),
            "product_name": product_names,
            "active": rng.random(n_products) < 0.55,
        }
    )

    store_id = rng.integers(1, n_stores + 1, n_fact).astype("int32")
    product_id = rng.integers(1, n_products + 1, n_fact).astype("int32")
    days = rng.integers(0, 4 * 365, n_fact)
    base = pd.Timestamp("2021-01-21")
    daily = pd.to_datetime(base + pd.to_timedelta(days, unit="D")).strftime(
        "%Y/%m/%d"
    )
    quantity = rng.integers(1, 21, n_fact).astype("float64")

    u = rng.random(n_fact)
    quantity[u < frac_negative] = -rng.integers(1, 3, (u < frac_negative).sum())
    m_zero = (u >= frac_negative) & (u < frac_negative + frac_zero)
    quantity[m_zero] = 0
    m_huge = (u >= frac_negative + frac_zero) & (
        u < frac_negative + frac_zero + frac_huge
    )
    quantity[m_huge] = rng.integers(2_000_000, 5_000_000, m_huge.sum())
    m_null = (u >= frac_negative + frac_zero + frac_huge) & (
        u < frac_negative + frac_zero + frac_huge + frac_null
    )
    quantity[m_null] = np.nan

    sellout = pd.DataFrame(
        {
            "store_id": store_id,
            "product_id": product_id,
            "daily": daily,
            "quantity": pd.array(
                [None if np.isnan(q) else int(q) for q in quantity],
                dtype="Int32",
            ),
        }
    )
    # duplicate-key injection: resample existing rows (keep-duplicates rule)
    n_dup = int(n_fact * frac_dup)
    dups = sellout.sample(n=n_dup, random_state=seed, replace=False)
    sellout = pd.concat([sellout, dups], ignore_index=True)

    return {
        "chains": chains,
        "stores": stores,
        "products": products,
        "sellout": sellout,
    }
