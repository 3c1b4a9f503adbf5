"""Golden test for the clickstream parity pipeline.

Fixture shapes follow FIXTURES.md A1/A2 (which mirror the reference's
generator, /root/reference/jobs/etl_job.py:492-541): all four site
families, multi-element parallel arrays, missing JSON keys, empty
arrays (explode_outer keep-row), null userid (maid fallback),
secondless timestamps (regex repair), KST day rollover, the login
null-pad branch, dim-join validity filtering, USER_ID truncation and
full-row dedup. Expected rows are computed by hand from the reference
semantics (SURVEY.md §2.8, §3 EP1) — not from running the pipeline.
"""

from __future__ import annotations

import pytest

from spark_etl_pipeline_spark.plans.etl import (
    clickstream_pipeline,
    reference_families,
)

LOG_SCHEMA = (
    "maid string, info struct<siteseq:string>, userid string, custid string, "
    "timestamp string, logtype string, custom string"
)
DIM_SCHEMA = (
    "SHOPPING_ID string, ITEM_CODE string, INTG_ID string, ITEM_NAME string, "
    "CAT1 string, CAT2 string, CAT3 string, CAT4 string, "
    "INTG_CAT1 string, INTG_CAT2 string, INTG_CAT3 string, INTG_CAT4 string"
)

FAMILIES = reference_families(("154992",), ("-48",), ("155138",), ("4550",))

LONG_USER = "u5-" + "x" * 120  # truncated to 100 chars by the pipeline

LOGS = [
    # default/purchase: multi-element parallel arrays → 2 exploded rows
    ("m1", ("154992",), "u1", "c1", "2019-06-01T01:43:09.000Z", "purchase",
     '{"productCode": ["P1", "P2"], "productName": ["N1", "N2"]}'),
    # default/view (rb: keys), NULL userid → maid fallback, secondless ts
    # 16:00 UTC → 01:00 NEXT DAY in KST (day rollover)
    ("m2", ("154992",), None, "c2", "2019-06-01T16:00:00Z", "view",
     '{"rb:itemId": ["R1"], "rb:itemName": ["RN1"]}'),
    # type1/cart (goodsCode/name keys) — appears TWICE → dedup to one row
    ("m3", ("-48",), "u3", "c3", "2019-06-01T05:00:00.000Z", "cart",
     '{"goodsCode": ["G1"], "name": ["GN1"]}'),
    ("m3", ("-48",), "u3", "c3", "2019-06-01T05:00:00.000Z", "cart",
     '{"goodsCode": ["G1"], "name": ["GN1"]}'),
    # type2/view: code is the LAST URL SEGMENT of og:url
    ("m4", ("155138",), "u4", "c4", "2019-06-01T05:00:00.000Z", "view",
     '{"og:url": ["http://shop.example/cat/sub/C9"], "og:title": ["T9"]}'),
    # type3/view (tas:productCode/Title), 120-char userid → truncated
    ("m5", ("4550",), LONG_USER, "c5", "2019-06-01T05:00:00.000Z", "view",
     '{"tas:productCode": ["TP1"], "Title": ["TT1"]}'),
    # login with no product keys → only the null-padded login branch
    ("m6", ("154992",), "u6", "c6", "2019-06-01T05:00:00.000Z", "login",
     "{}"),
    # purchase with MISSING keys → null arrays → dropped by the dim join
    ("m7", ("154992",), "u7", "c7", "2019-06-01T05:00:00.000Z", "purchase",
     "{}"),
    # purchase with EMPTY arrays → explode_outer keeps the row, but the
    # empty-string code never matches the dim → dropped
    ("m8", ("154992",), "u8", "c8", "2019-06-01T05:00:00.000Z", "purchase",
     '{"productCode": [], "productName": []}'),
    # purchase with a code NOT in the dim → validity-filtered out
    ("m9", ("154992",), "u9", "c9", "2019-06-01T05:00:00.000Z", "purchase",
     '{"productCode": ["X1"], "productName": ["XN1"]}'),
]


def dim_row(sid: str, code: str) -> tuple[str, ...]:
    return (sid, code, f"I-{code}", f"N-{code}",
            "c1", "c2", "c3", "c4", "ic1", "ic2", "ic3", "ic4")


DIM = [
    dim_row("154992", "P1"),
    dim_row("154992", "P2"),
    dim_row("154992", "R1"),
    dim_row("-48", "G1"),
    dim_row("155138", "C9"),
    dim_row("4550", "TP1"),
]


def joined(user: str, sid: str, date: str, time: str, logtype: str, code: str):
    return (user, sid, date, time, logtype,
            f"I-{code}", code, f"N-{code}",
            "c1", "c2", "c3", "c4", "ic1", "ic2", "ic3", "ic4")


EXPECTED = sorted(
    [
        joined("u1", "154992", "2019-06-01", "10:43:09", "purchase", "P1"),
        joined("u1", "154992", "2019-06-01", "10:43:09", "purchase", "P2"),
        # maid fallback + KST rollover to June 2
        joined("m2", "154992", "2019-06-02", "01:00:00", "view", "R1"),
        joined("u3", "-48", "2019-06-01", "14:00:00", "cart", "G1"),
        joined("u4", "155138", "2019-06-01", "14:00:00", "view", "C9"),
        joined(LONG_USER[:100], "4550", "2019-06-01", "14:00:00", "view", "TP1"),
        # login branch: null ITEM_CODE + null dim columns
        ("u6", "154992", "2019-06-01", "14:00:00", "login",
         None, None, None, None, None, None, None, None, None, None, None),
    ],
    key=lambda r: tuple("" if v is None else str(v) for v in r),
)


@pytest.fixture(scope="module")
def result(spark):
    logs = spark.createDataFrame(LOGS, LOG_SCHEMA)
    dim = spark.createDataFrame(DIM, DIM_SCHEMA)
    return clickstream_pipeline(logs, dim, FAMILIES)


def test_output_schema(result):
    assert result.columns == [
        "USER_ID", "SHOPPING_ID", "TRANSACTION_DATE", "TRANSACTION_TIME",
        "LOG_TYPE", "INTG_ID", "ITEM_CODE", "ITEM_NAME",
        "CAT1", "CAT2", "CAT3", "CAT4",
        "INTG_CAT1", "INTG_CAT2", "INTG_CAT3", "INTG_CAT4",
    ]


def test_golden_rows(result):
    got = sorted(
        [tuple(r) for r in result.collect()],
        key=lambda r: tuple("" if v is None else str(v) for v in r),
    )
    assert got == EXPECTED
