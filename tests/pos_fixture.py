"""Deterministic R520-style fixture generator (FIXTURES.md A1/A2):
builds 520-char records, packs them into a zip (single text member),
and provides a pure-Python expected derivation for mart parity checks."""

from __future__ import annotations

import datetime
import io
import random
import zipfile

RECORD_WIDTH = 520

# Multibyte filler prefix: exercises character (not byte) offsets.
FILLER_PREFIX = "店舗データ"  # 5 chars, 15 UTF-8 bytes


def make_record(
    business_date: datetime.date,
    store_id: int,
    register_id: int,
    txn_id: int,
    txn_time: str,
    sku: int,
    dept: int,
    qty: int,
    unit_price: int,
    sales_amount: int,
    discount: int,
    flag: int,
    payment: str,
) -> str:
    head = (
        "R520"
        + business_date.strftime("%Y%m%d")
        + f"{store_id:06d}"
        + f"{register_id:04d}"
        + f"{txn_id:010d}"
        + txn_time
        + f"{sku:013d}"
        + f"{dept:04d}"
        + f"{qty:>6}"
        + f"{unit_price:>10}"
        + f"{sales_amount:>12}"
        + f"{discount:>10}"
        + str(flag)
        + payment
    )
    assert len(head) == 96, len(head)
    body = head + FILLER_PREFIX
    return body + " " * (RECORD_WIDTH - len(body))


def build_fixture(
    n_days: int = 8,
    stores: int = 3,
    txns_per_store_day: int = 5,
    lines_per_txn: int = 3,
    dup_every: int = 7,
    seed: int = 7,
):
    """Returns (records: list[str], rows: list[dict]) -- rows are the
    typed expectation for the DISTINCT keyed records (pre-dup)."""
    rng = random.Random(seed)
    start = datetime.date(2024, 3, 1)
    records: list[str] = []
    rows: list[dict] = []
    txn_counter = 0
    for d in range(n_days):
        day = start + datetime.timedelta(days=d)
        for s in range(1, stores + 1):
            for t in range(txns_per_store_day):
                txn_counter += 1
                for ln in range(lines_per_txn):
                    qty = rng.randint(1, 9)
                    price = rng.randint(100, 5000)
                    disc = rng.randint(0, 200)
                    row = dict(
                        business_date=day,
                        store_id=f"{s:06d}",
                        register_id=f"{(t % 4) + 1:04d}",
                        txn_id=f"{txn_counter:010d}",
                        txn_time=f"{8 + t:02d}{ln * 7 % 60:02d}30",
                        sku=f"{4900000000000 + rng.randint(1, 999):013d}",
                        dept_code=f"{(ln % 5) + 1:04d}",
                        quantity=qty,
                        unit_price=price,
                        sales_amount=qty * price - disc,
                        discount_amount=disc,
                        customer_count_flag=1 if ln == 0 else 0,
                        payment_code=rng.choice(["01", "02", "03"]),
                    )
                    rows.append(row)
                    rec = make_record(
                        day,
                        s,
                        int(row["register_id"]),
                        txn_counter,
                        row["txn_time"],
                        int(row["sku"]),
                        int(row["dept_code"]),
                        qty,
                        price,
                        row["sales_amount"],
                        disc,
                        row["customer_count_flag"],
                        row["payment_code"],
                    )
                    records.append(rec)
                    if len(records) % dup_every == 0:
                        records.append(rec)  # exact duplicate -> merge dedup
    return records, rows


def write_zip(records: list[str], path: str, partial_tail: str = "") -> None:
    payload = "".join(records) + partial_tail
    with zipfile.ZipFile(path, "w", zipfile.ZIP_DEFLATED) as zf:
        zf.writestr("R520_daily.txt", payload.encode("utf-8"))
