"""SparkSession factory with scale-ready defaults.

Replaces the reference's session factory (``etl.py:20-31``) which set
``spark.jars.packages`` twice (the second ``.config`` overwrote the first)
and relied on implicit defaults. Here the defaults are chosen for large
clusters and merely *bounded* for local runs:

  - AQE on (runtime shuffle-partition coalescing, skew-join splitting).
  - Arrow on (vectorized pandas-UDF transfer for the few Python ops).
  - Session timezone pinned to UTC for deterministic date/timestamp math.
  - ``spark.sql.shuffle.partitions`` set from the env/cpu count locally;
    on a real cluster AQE re-coalesces, so a generous initial value is
    safe at 100 TB while not over-sharding a laptop run.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession


def object_store_conf(
    access_key: str | None = None,
    secret_key: str | None = None,
    session_token: str | None = None,
    endpoint: str | None = None,
    region: str | None = None,
    path_style_access: bool | None = None,
    anonymous: bool = False,
) -> dict[str, str]:
    """S9: translate a storage-options dict into the ``fs.s3a.*`` confs
    an object-store-backed lake needs (reference ``etl.py:29-30`` pulled
    in ``hadoop-aws`` and set AWS creds from ``dl.cfg`` env at
    ``etl.py:293-299``; its double-``.config()`` bug meant the package
    never actually loaded).

    Credential precedence mirrors the reference's env-based flow: pass
    keys explicitly, or omit them to fall back to ``AWS_ACCESS_KEY_ID``/
    ``AWS_SECRET_ACCESS_KEY``/``AWS_SESSION_TOKEN`` from the environment;
    with neither, the provider chain is left to Hadoop's default (IAM
    instance/role credentials — what a real cluster should use).
    """
    conf: dict[str, str] = {}
    access_key = access_key or os.environ.get("AWS_ACCESS_KEY_ID")
    secret_key = secret_key or os.environ.get("AWS_SECRET_ACCESS_KEY")
    session_token = session_token or os.environ.get("AWS_SESSION_TOKEN")
    if anonymous:
        conf["spark.hadoop.fs.s3a.aws.credentials.provider"] = (
            "org.apache.hadoop.fs.s3a.AnonymousAWSCredentialsProvider"
        )
    elif access_key and secret_key:
        conf["spark.hadoop.fs.s3a.access.key"] = access_key
        conf["spark.hadoop.fs.s3a.secret.key"] = secret_key
        if session_token:
            conf["spark.hadoop.fs.s3a.session.token"] = session_token
            conf["spark.hadoop.fs.s3a.aws.credentials.provider"] = (
                "org.apache.hadoop.fs.s3a.TemporaryAWSCredentialsProvider"
            )
    if endpoint:
        conf["spark.hadoop.fs.s3a.endpoint"] = endpoint
    if region:
        conf["spark.hadoop.fs.s3a.endpoint.region"] = region
    if path_style_access is not None:
        conf["spark.hadoop.fs.s3a.path.style.access"] = str(path_style_access).lower()
    # Committer defaults that matter at 100 TB: the magic committer
    # avoids the O(files) sequential rename pass of FileOutputCommitter
    # v1 on object stores (rename = copy there).
    conf["spark.hadoop.fs.s3a.committer.name"] = "magic"
    conf["spark.sql.sources.commitProtocolClass"] = (
        "org.apache.spark.internal.io.cloud.PathOutputCommitProtocol"
    )
    conf["spark.sql.parquet.output.committer.class"] = (
        "org.apache.spark.internal.io.cloud.BindingParquetOutputCommitter"
    )
    return conf


def session_builder(
    app_name: str = "udacity_capstone_data_engineering_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
    storage_options: dict | None = None,
    hive_support: bool = False,
) -> SparkSession.Builder:
    """Return a configured builder; caller may further customize.

    ``storage_options``: kwargs for :func:`object_store_conf` — the
    one-stop way to point the engine at an s3a:// lake. ``hive_support``
    enables the Hive metastore catalog (reference ``etl.py:30``)."""
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 4))
    if master is None:
        master = f"local[{cpus}]"
    if shuffle_partitions is None:
        shuffle_partitions = cpus

    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.parquet.filterPushdown", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "8g"))
    )
    if storage_options is not None:
        for k, v in object_store_conf(**storage_options).items():
            builder = builder.config(k, v)
    if hive_support:
        builder = builder.enableHiveSupport()
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder


def get_spark(**kwargs) -> SparkSession:
    """Create or reuse the engine SparkSession."""
    return session_builder(**kwargs).getOrCreate()


def local_df(spark: SparkSession, rows, schema) -> DataFrame:
    """JVM-friendly local relation for receipts and artifact relations
    (guide §4.1: control how data crosses the Python boundary).

    ``createDataFrame(list, schema)`` parallelizes the PICKLED rows over
    every default-parallelism slot, and each mostly-empty partition pays
    a Python-worker round-trip (~140 ms here). A downstream
    ``coalesce(1)`` artifact write evaluates all those parents SERIALLY
    inside one task — measured 4.5 s for a ONE-ROW relation (r11 job
    breakdown of ``ann_index_build``: three such writes were 13.4 s of
    its 17.5 s wall). The Arrow path ships the rows as one record batch
    into the JVM (a 1-partition scan, ~0.2 s); when Arrow is off (a
    vanilla consumer session), ``parallelize(rows, 1)`` keeps it to a
    single Python round-trip (~0.3 s). Values and schema are identical
    in all three regimes — only the partitioning of the local relation
    changes."""
    rows = list(rows)
    if not rows:
        return spark.createDataFrame(rows, schema=schema)
    if (
        spark.conf.get("spark.sql.execution.arrow.pyspark.enabled", "false")
        == "true"
    ):
        try:
            import pandas as pd
            from pyspark.sql.types import _parse_datatype_string

            st = (
                _parse_datatype_string(schema)
                if isinstance(schema, str)
                else schema
            )
            pdf = pd.DataFrame(rows, columns=st.fieldNames())
            return spark.createDataFrame(pdf, schema=st)
        except Exception:
            pass  # exotic types: fall through to the 1-slice pickle path
    return spark.createDataFrame(
        spark.sparkContext.parallelize(rows, 1), schema=schema
    )


_SHIPPED_CONTEXTS: set[str] = set()


def ensure_worker_imports(spark: SparkSession) -> None:
    """Make this package importable by PYTHON WORKERS regardless of the
    driver's working directory or session factory.

    An external driver (the contract consumer) builds its OWN
    SparkSession and may run from any CWD. The driver process fixes its
    import path with ``sys.path.insert`` — but a ``sys.path`` edit
    never reaches the daemon-forked python workers, so any query whose
    pandas-UDF closure references package functions (the ANN kernels)
    dies in worker unpickling with ModuleNotFoundError unless the repo
    happens to be the CWD. Shipping a zip of the package via
    ``addPyFile`` (once per SparkContext; ~100 KB) closes the gap for
    every launch shape; when the workers can already import the package
    (repo CWD at JVM start, or repo on PYTHONPATH) this is skipped.
    """
    sc = spark.sparkContext
    app = sc.applicationId
    if app in _SHIPPED_CONTEXTS:
        return
    pkg_dir = os.path.dirname(os.path.abspath(__file__))
    root = os.path.dirname(pkg_dir)
    # Probe the JVM's env/cwd, NOT this process's: workers fork from
    # the JVM daemon, and a PYTHONPATH exported into the DRIVER'S env
    # after the JVM launched (the __spark_entry__ import does this for
    # future sessions) never reaches an already-running JVM's workers.
    try:
        jvm = sc._jvm
        jvm_pp = jvm.java.lang.System.getenv("PYTHONPATH") or ""
        jvm_cwd = jvm.java.lang.System.getProperty("user.dir") or ""
    except Exception:  # Spark Connect etc. — can't introspect: ship
        jvm_pp, jvm_cwd = "", ""
    on_pythonpath = root in jvm_pp.split(os.pathsep)
    cwd_is_root = jvm_cwd and os.path.realpath(jvm_cwd) == os.path.realpath(
        root
    )
    if not (on_pythonpath or cwd_is_root):
        import tempfile
        import zipfile

        zip_path = os.path.join(
            tempfile.gettempdir(), f"udacity_capstone_data_engineering_spark-{os.getpid()}.zip"
        )
        if not os.path.exists(zip_path):
            with zipfile.ZipFile(zip_path, "w", zipfile.ZIP_DEFLATED) as zf:
                for dirpath, dirnames, filenames in os.walk(pkg_dir):
                    dirnames[:] = [d for d in dirnames if d != "__pycache__"]
                    for fn in filenames:
                        if fn.endswith(".py"):
                            full = os.path.join(dirpath, fn)
                            arc = os.path.relpath(full, root)
                            zf.write(full, arc)
        sc.addPyFile(zip_path)
    _SHIPPED_CONTEXTS.add(app)
