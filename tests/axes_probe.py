"""Subprocess body for the session-shape drift axes (25th/26th).

Not a test module (no ``test_`` prefix): the parallelism axis needs a
master the shared test session can't provide (``local[1]`` is a static
conf), and the locale axis needs the JVM itself launched under a
hostile default locale/charset — both require a fresh process. The
tests in test_session_axes.py spawn this script and assert on its
final RESULT line.

Usage: python axes_probe.py <shape> [sf_dir] [keys_csv]
  shape = local1   -> master=local[1], shuffle.partitions=1, AQE off
        | prime    -> master=local[8], shuffle.partitions=257, AQE off
        | tr_locale-> master=local[8], JVM under tr_TR + ISO-8859-9

Engine calls go through the REGISTRY functions directly (engine API,
not the driver wrap): tune_for_session would repin the session shape,
and the axis exists to prove the OPERATORS are shape-independent — on
a 1000-executor cluster shuffle.partitions is thousands, not the
local-mode 32, and results must not depend on it. The locale shape
goes through __spark_entry__'s wrap instead (the driver's path — a
hostile JVM locale is an environment hazard the full contract surface
must survive, not a session conf the wrap may repin).
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession  # noqa: E402


def build(shape: str) -> SparkSession:
    b = (
        SparkSession.builder.config("spark.driver.memory", "8g")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.session.timeZone", "UTC")
        .appName(f"axes-probe-{shape}")
    )
    if shape == "local1":
        b = (
            b.master("local[1]")
            .config("spark.sql.shuffle.partitions", "1")
            .config("spark.sql.adaptive.enabled", "false")
        )
    elif shape == "prime":
        b = (
            b.master("local[8]")
            .config("spark.sql.shuffle.partitions", "257")
            .config("spark.sql.adaptive.enabled", "false")
        )
    elif shape == "tr_locale":
        # The classic hostile default: Turkish dotted/dotless i casing
        # ("dynamic".toUpperCase() -> "DYNAMİC") plus a non-UTF-8
        # default charset. JEP 400 made file.encoding UTF-8-only in
        # JDK 18+; on the JDK 17 this repo targets the flag is honored.
        b = b.master("local[8]").config(
            "spark.driver.extraJavaOptions",
            "-Duser.language=tr -Duser.country=TR "
            "-Dfile.encoding=ISO-8859-9 -Dsun.jnu.encoding=ISO-8859-9",
        )
    else:
        raise SystemExit(f"unknown shape {shape!r}")
    return b.getOrCreate()


def main() -> None:
    shape = sys.argv[1]
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.001"
    keys = sys.argv[3].split(",") if len(sys.argv) > 3 else None

    if shape == "tr_locale":
        os.environ.setdefault("LANG", "tr_TR.ISO-8859-9")
        os.environ.setdefault("LC_ALL", "tr_TR.ISO-8859-9")

    spark = build(shape)
    from serverless_etl_aws_spark.compare import run_all
    from serverless_etl_aws_spark.session import ship_package, tune_for_session

    if shape == "tr_locale":
        jvm = spark.sparkContext._jvm
        loc = jvm.java.util.Locale.getDefault().toString()
        enc = jvm.java.lang.System.getProperty("file.encoding")
        print(f"ENV locale={loc} file.encoding={enc}", flush=True)
        if not loc.startswith("tr"):
            print("RESULT vacuous=1 n=0 failed=-1 fails=['locale-not-applied']")
            raise SystemExit(2)
        tune_for_session(spark)  # the driver's path
    else:
        ship_package(spark)  # workers need the package; confs stay hostile
        spark.conf.set("spark.sql.execution.arrow.pyspark.enabled", "true")
        spark.conf.set("spark.sql.execution.pythonUDTF.arrow.enabled", "true")

    t0 = time.time()
    res = run_all(spark, sf_dir, keys=keys, strict=True)
    bad = [r.key for r in res if not r.ok]
    for r in res:
        if not r.ok:
            print(f"FAIL {r.key}: {r.detail[:200]}", flush=True)
    print(
        f"RESULT shape={shape} n={len(res)} failed={len(bad)} "
        f"fails={bad} secs={time.time() - t0:.0f}",
        flush=True,
    )
    spark.stop()
    raise SystemExit(1 if bad else 0)


if __name__ == "__main__":
    main()
