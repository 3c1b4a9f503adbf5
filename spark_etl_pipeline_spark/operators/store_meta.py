"""Constants-version stamps for materialized dedup/similarity stores.

A signature store is a FUNCTION OF ITS CONSTANTS: minhash signatures
depend on the affine permutation multipliers (``dedup.A``/``dedup.B``),
band keys on the banding layout, hyperplane signatures on the exact
plane vectors. Changing any of those (as round 8's correlated-
permutation fix did) silently invalidates every store persisted under
the old values — probing it doesn't error, it just returns garbage
similarities. These helpers turn that hazard into a LOUD, immediate
failure: builds stamp the store with an md5 of the constants that
produced it, and every append/probe refuses a stamp mismatch (or a
missing stamp — an unstamped store has unknown provenance) with the
remediation spelled out.

The stamp is a one-row parquet table under ``{store_path}/constants_stamp``
— written and read through Spark, so it works on any filesystem the
store itself lives on (local, HDFS, object store); the data tables
are always read via their explicit subdirs (bands/shingles,
sigs/vectors), so the stamp never enters a data scan. (A leading
underscore would make the dir Spark-hidden — readable only through
ambiguous fallback behavior that logs 'All paths were ignored' — so
the name is deliberately unhidden.) Cost is one metadata-sized IO per build/probe,
nothing per-row.
"""

from __future__ import annotations

from pyspark.sql import SparkSession


def write_store_stamp(
    spark: SparkSession, store_path: str, family: str, version: str
) -> None:
    """Stamp a freshly-built store with its constants version."""
    spark.createDataFrame(
        [(family, version)], "family string, constants_version string"
    ).coalesce(1).write.mode("overwrite").parquet(f"{store_path}/constants_stamp")


def check_store_stamp(
    spark: SparkSession, store_path: str, family: str, version: str
) -> None:
    """Refuse to touch a store whose constants differ from the session's.

    Raises ``ValueError`` on a missing stamp (unknown provenance) or a
    mismatched one (store built under different constants). Appending
    or probing across constants revisions would not error on its own —
    it would silently mix incomparable signatures. A TRANSIENT read
    failure (object-store timeout, permission blip) is deliberately NOT
    converted into "no stamp": only the analysis-time path-missing
    class gets the rebuild advice — telling an operator to rebuild a
    multi-TB store over a 403 would be destructive — everything else
    propagates as itself.
    """
    from pyspark.errors import AnalysisException

    try:
        # one-row metadata table — this collect() moves a stamp, not data
        rows = spark.read.parquet(f"{store_path}/constants_stamp").collect()
    except AnalysisException as exc:
        raise ValueError(
            f"store at {store_path!r} carries no constants stamp "
            f"(constants_stamp missing): refusing to "
            f"{family}-probe a store of unknown provenance. Rebuild it "
            f"with the current constants (build_*_store), or stamp it "
            f"explicitly with write_store_stamp() if its constants are "
            f"known to match."
        ) from exc
    got = {(r.family, r.constants_version) for r in rows}
    if got != {(family, version)}:
        raise ValueError(
            f"store at {store_path!r} was built under different "
            f"constants (stamp {sorted(got)}, session expects "
            f"('{family}', '{version}')): signatures are a function of "
            f"the constants, so probing or appending across revisions "
            f"silently yields garbage similarities. Rebuild the store "
            f"with the current constants."
        )
