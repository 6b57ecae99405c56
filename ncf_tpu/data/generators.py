"""Warehouse-row generators: customers, stores, products, transactions.

Capability-parity with the reference datagen stack (reference:
src/data/generators/loyalty_customer_generator.py:8-147,
store_generator.py:8-668, product_generator.py:8-160,
transaction_generator.py:10-233): the same statistical structure —
state distribution PA .40 / OH .15 / WV .15 / VA .15 / MD .10 / NC .05,
enrollment-status mix, coherent date timelines, store type/profile
weights, category taxonomy with LLM-templated names, hourly visit
weights, Poisson(2.5) baskets clamped [1,8], 80% home-store preference,
6% tax — emitted as schema-conformant rows (ncf_tpu.data.schemas) and an
``Interactions`` training view, generated vectorized instead of
row-by-row Python dicts bound for BigQuery.
"""

from __future__ import annotations

from typing import Dict, List, Tuple

import numpy as np

from ncf_tpu.data.interactions import SECONDS_PER_DAY, Interactions
from ncf_tpu.data.schemas import DatasetWriter
from ncf_tpu.data.synthetic import _catalog, generate_interactions
from ncf_tpu.naming import ProductNameGenerator

# loyalty_customer_generator.py state distribution
STATE_DIST = [("PA", 0.40), ("OH", 0.15), ("WV", 0.15),
              ("VA", 0.15), ("MD", 0.10), ("NC", 0.05)]
# enrollment status mix: active / lapsed / new
ENROLLMENT_DIST = [(1, 0.75), (0, 0.15), (2, 0.10)]
# store_generator.py type weights + location profiles
STORE_TYPES = [("standard", 0.6), ("travel_center", 0.15),
               ("urban", 0.15), ("compact", 0.10)]
LOCATION_PROFILES = {
    "standard": ["suburban", "highway"],
    "travel_center": ["highway", "interstate"],
    "urban": ["downtown", "campus"],
    "compact": ["neighborhood", "downtown"],
}
AMENITIES = {
    "standard": ["fuel", "car_wash", "mto_kitchen", "atm"],
    "travel_center": ["fuel", "diesel", "showers", "parking", "mto_kitchen"],
    "urban": ["mto_kitchen", "coffee_bar", "atm"],
    "compact": ["fuel", "atm"],
}
STATE_LATLON = {  # rough state bounding boxes (store_generator.py analogue)
    "PA": (39.7, 42.0, -80.5, -75.0), "OH": (38.4, 41.9, -84.8, -80.5),
    "WV": (37.2, 40.6, -82.6, -77.7), "VA": (36.5, 39.4, -83.6, -75.2),
    "MD": (37.9, 39.7, -79.4, -75.0), "NC": (33.8, 36.5, -84.3, -75.4),
}


def _choice(rng, pairs):
    vals = [v for v, _ in pairs]
    p = np.asarray([w for _, w in pairs])
    return [vals[i] for i in rng.choice(len(vals), size=1, p=p / p.sum())][0]


def generate_customers(num: int, seed: int = 0,
                       start_day: int = 0) -> List[Dict]:
    """loyalty_customer_dim rows (loyalty_customer_generator.py:8-147)."""
    rng = np.random.default_rng(seed)
    states = [s for s, _ in STATE_DIST]
    sp = np.asarray([w for _, w in STATE_DIST])
    st = rng.choice(len(states), size=num, p=sp / sp.sum())
    en_vals = [v for v, _ in ENROLLMENT_DIST]
    ep = np.asarray([w for _, w in ENROLLMENT_DIST])
    en = rng.choice(len(en_vals), size=num, p=ep / ep.sum())
    # coherent timeline: activation <= first txn <= last txn
    activation = rng.integers(0, 365, num) * SECONDS_PER_DAY
    first_txn = activation + rng.integers(0, 30, num) * SECONDS_PER_DAY
    last_txn = first_txn + rng.integers(0, 300, num) * SECONDS_PER_DAY
    points = rng.gamma(2.0, 500.0, num)
    rows = []
    for i in range(num):
        rows.append({
            "cardnumber": f"7{i:011d}",
            "cust_code": f"C{i:08d}",
            "first_name": f"First{i}",
            "last_name": f"Last{i}",
            "email": f"user{i}@example.com",
            "state": states[st[i]],
            "zip": f"{15000 + int(rng.integers(0, 5000)):05d}",
            "enrollment_status": int(en_vals[en[i]]),
            "activation_date": int(activation[i]),
            "first_transaction_date": int(first_txn[i]),
            "last_transaction_date": int(last_txn[i]),
            "lifetime_points": float(round(points[i], 2)),
            "first_transaction_location_id": f"S{int(rng.integers(0, 100)):04d}",
        })
    return rows


def generate_stores(num: int, seed: int = 0) -> List[Dict]:
    """store_dim rows (store_generator.py:8-668, condensed profile)."""
    rng = np.random.default_rng(seed)
    rows = []
    for i in range(num):
        stype = _choice(rng, STORE_TYPES)
        state = _choice(rng, STATE_DIST)
        lat0, lat1, lon0, lon1 = STATE_LATLON[state]
        rows.append({
            "location_id": f"S{i:04d}",
            "store_type": stype,
            "state": state,
            "latitude": float(round(lat0 + rng.random() * (lat1 - lat0), 5)),
            "longitude": float(round(lon0 + rng.random() * (lon1 - lon0), 5)),
            "location_profile": str(rng.choice(LOCATION_PROFILES[stype])),
            "open_date": int(rng.integers(0, 3650)) * SECONDS_PER_DAY,
            "amenities": AMENITIES[stype],
        })
    return rows


def generate_products(num: int, seed: int = 0) -> Tuple[List[Dict], np.ndarray, np.ndarray]:
    """product_features rows with generated names
    (product_generator.py:8-160 + the naming subsystem).  Returns
    (rows, item_dept int32[num], item_cat int32[num])."""
    rng = np.random.default_rng(seed)
    item_cat, item_dept, _, item_price, cat_names, dept_names = _catalog(
        num, rng)
    namer = ProductNameGenerator(seed=seed)
    names_by_cat: Dict[int, List] = {}
    for c in np.unique(item_cat):
        count = int((item_cat == c).sum())
        names_by_cat[int(c)] = namer.generate_for_category(
            cat_names[int(c)], count)
    cursor = {int(c): 0 for c in names_by_cat}
    rows = []
    for i in range(num):
        c = int(item_cat[i])
        p = names_by_cat[c][cursor[c]]
        cursor[c] += 1
        rows.append({
            "product_id": f"P{i:06d}",
            "product_name": p.name,
            "department_code": dept_names[int(item_dept[i])],
            "category_code": cat_names[c],
            "size": p.size,
            "unit_price": float(round(item_price[i], 2)),
            "is_hot": p.is_hot,
            "is_cold": p.is_cold,
            "dietary_flags": p.dietary_flags,
        })
    return rows, item_dept, item_cat


def generate_transactions(
    inter: Interactions, num_stores: int = 20, seed: int = 0,
) -> Tuple[List[Dict], List[Dict]]:
    """transaction_header_fact + transaction_body_fact rows from an
    interaction log, re-grouped into visits (transaction_generator.py
    :180-233: header+items with subtotal/6% tax/total, 80% home-store
    preference)."""
    rng = np.random.default_rng(seed)
    home_store = rng.integers(0, num_stores, inter.num_users)
    headers, bodies = [], []
    # group consecutive same-(user, timestamp) rows into one visit
    n = len(inter)
    txn = 0
    i = 0
    while i < n:
        u = int(inter.user_ids[i])
        ts = int(inter.timestamps[i])
        j = i
        while (j < n and int(inter.user_ids[j]) == u
               and int(inter.timestamps[j]) == ts):
            j += 1
        store = int(home_store[u]) if rng.random() < 0.8 else int(
            rng.integers(0, num_stores))
        subtotal = 0.0
        for line, r in enumerate(range(i, j)):
            qty = 1
            unit = float(inter.amounts[r]) / 1.06
            subtotal += unit * qty
            bodies.append({
                "store_number": f"S{store:04d}",
                "transaction_number": f"T{txn:010d}",
                "line_number": line + 1,
                "product_id": f"P{int(inter.item_ids[r]):06d}",
                "quantity": qty,
                "unit_price": round(unit, 4),
                "extended_price": round(unit * qty, 4),
            })
        tax = subtotal * 0.06
        headers.append({
            "store_number": f"S{store:04d}",
            "transaction_number": f"T{txn:010d}",
            "cardnumber": f"7{u:011d}",
            "cust_code": f"C{u:08d}",
            "transaction_date": ts,
            "subtotal": round(subtotal, 4),
            "tax": round(tax, 4),
            "total": round(subtotal + tax, 4),
            "item_count": j - i,
        })
        txn += 1
        i = j
    return headers, bodies


def build_warehouse(
    root: str,
    num_users: int = 1000,
    num_items: int = 200,
    num_stores: int = 20,
    num_days: int = 60,
    seed: int = 0,
) -> Interactions:
    """Generate and persist all five warehouse tables + return the
    Interactions training view (the scripts/1.*/01-02c pipeline in one
    call)."""
    writer = DatasetWriter(root)
    for table in ("loyalty_customer_dim", "store_dim", "product_features",
                  "transaction_header_fact", "transaction_body_fact"):
        writer.clear_table(table)

    writer.insert_rows("loyalty_customer_dim",
                       generate_customers(num_users, seed))
    writer.insert_rows("store_dim", generate_stores(num_stores, seed + 1))
    product_rows, _, _ = generate_products(num_items, seed + 2)
    writer.insert_rows("product_features", product_rows)

    inter = generate_interactions(
        num_users=num_users, num_items=num_items, num_days=num_days,
        seed=seed + 3)
    headers, bodies = generate_transactions(inter, num_stores, seed + 4)
    writer.insert_rows("transaction_header_fact", headers)
    writer.insert_rows("transaction_body_fact", bodies)
    return inter
