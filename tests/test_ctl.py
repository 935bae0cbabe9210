"""binlogctl-analog CLI: generate_meta savepoint semantics
(binlogctl/meta.go:34-51 GenerateMetaInfo + :82-107 saveMeta)."""

from __future__ import annotations

import importlib.util
import json
import os
import sys

SF = "/root/testdata/sf0.001"


def _run_ctl(argv, capsys):
    spec = importlib.util.spec_from_file_location(
        "ctl", os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "tools", "ctl.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    old = sys.argv
    sys.argv = ["ctl.py"] + argv
    try:
        rc = mod.main()
    finally:
        sys.argv = old
    return rc, capsys.readouterr().out


def test_generate_meta_savepoint(spark, tmp_path, capsys):
    """The savepoint records the change log's max commit ts (the TSO
    analog), in meta.go's TOML shape, with rough-time trailer lines
    when a timezone is given, written atomically."""
    from pyspark.sql import functions as F
    from tidb_binlog_spark.sources.changestream import change_stream

    out_dir = str(tmp_path / "meta")
    rc, out = _run_ctl(["generate_meta", SF, out_dir, "Asia/Kolkata"],
                       capsys)
    assert rc == 0
    want_ts = change_stream(spark, SF) \
        .agg(F.max("commit_ts")).first()[0]
    assert json.loads(out.strip().splitlines()[-1]) == {
        "commitTS": want_ts}
    lines = open(os.path.join(out_dir, "savepoint")).read().splitlines()
    assert lines[0] == f"commitTS = {want_ts}"
    assert len(lines) == 3               # UTC + local rough time
    assert lines[2].endswith("+05:30")
    assert not os.path.exists(os.path.join(out_dir, "savepoint.tmp"))

    # no timezone -> TOML line only; bad timezone -> warn-and-omit
    rc, out = _run_ctl(["generate_meta", SF, out_dir], capsys)
    assert rc == 0
    assert open(os.path.join(out_dir, "savepoint")).read() \
        == f"commitTS = {want_ts}\n"
    rc, _ = _run_ctl(["generate_meta", SF, out_dir, "Not/AZone"], capsys)
    assert rc == 0
    assert open(os.path.join(out_dir, "savepoint")).read() \
        == f"commitTS = {want_ts}\n"
