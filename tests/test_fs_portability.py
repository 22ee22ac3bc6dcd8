"""Filesystem-portability gate: no driver-local probes or moves on
data paths anywhere in the package.

The r7 verdict's top defect class: ``os.path.exists`` on a table path
is always False on HDFS/S3, so the code silently takes the bootstrap
branch (the semantic-dedup tier never engaged — wrong RESULTS, no
error), and ``shutil`` swaps only move data on the driver's own
disk. Round 8 removed the last of these (streaming/ingest.py probe,
merge_backend probes + swap, sinks SCD2 swap); this test keeps the
class dead. Existence probes go through spark.read +
AnalysisException or ``sources/layout.hadoop_exists``; swaps through
``sources/layout._fs_swap``; parent-path math through
``sources/layout.sibling_path`` (pathlib collapses ``s3a://`` to
``s3a:/``).
"""

import re
from pathlib import Path

PKG = Path(__file__).resolve().parent.parent / "vbb_data_pipeline_spark"

#: driver-local calls that are wrong on any remote filesystem when
#: aimed at table/data paths
BANNED = re.compile(
    r"(?<!\w)(os\.path\.exists|os\.path\.isfile|os\.path\.isdir|"
    r"os\.path\.getsize|shutil\.move|shutil\.rmtree|shutil\.copytree)\("
)

#: file: line-substring pairs allowed to keep a banned call (each one
#: must justify itself as genuinely driver-local, e.g. a local temp
#: cache). Currently empty — keep it that way.
ALLOW: set[tuple[str, str]] = set()


def test_no_driver_local_fs_probes_or_moves():
    hits = []
    for f in sorted(PKG.rglob("*.py")):
        for i, line in enumerate(f.read_text().splitlines(), 1):
            code = line.split("#", 1)[0]  # comments may cite the ban
            m = BANNED.search(code)
            if not m:
                continue
            rel = str(f.relative_to(PKG.parent))
            if any(rel == a and s in line for a, s in ALLOW):
                continue
            hits.append(f"{rel}:{i}: {line.strip()}")
    assert not hits, (
        "driver-local filesystem call on what is probably a data "
        "path — probe via spark.read/hadoop_exists, swap via "
        "_fs_swap:\n" + "\n".join(hits)
    )


def test_sibling_path_shapes():
    """Temp-sibling path math across every path shape a swap target
    can take — notably a bare relative segment must yield a SIBLING
    (pathlib parent semantics), never a child that the swap's rename
    would then carry away with the target."""
    import pytest

    from vbb_data_pipeline_spark.sources.layout import sibling_path

    assert sibling_path("s3a://b/warehouse/t", ".m_1") == "s3a://b/warehouse/.m_1"
    assert sibling_path("s3a://b/t", ".m_1") == "s3a://b/.m_1"
    assert sibling_path("s3a://b/t/", ".m_1") == "s3a://b/.m_1"
    assert sibling_path("/data/t", ".m_1") == "/data/.m_1"
    assert sibling_path("/t", ".m_1") == "/.m_1"
    assert sibling_path("rel/t", ".m_1") == "rel/.m_1"
    assert sibling_path("mytable", ".m_1") == "./.m_1"
    with pytest.raises(ValueError):
        sibling_path("s3a://bucket", ".m_1")  # bucket root: no parent
    with pytest.raises(ValueError):
        sibling_path("s3a://bucket/", ".m_1")
