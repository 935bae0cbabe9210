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


def test_encrypt_decrypt_roundtrip(capsys, monkeypatch):
    """pkg/encrypt parity: base64(iv || '@' || AES-CFB body); env key
    override; 16/24/32-byte key validation; '@' separator check."""
    import base64

    from tidb_binlog_spark import encrypt as enc

    monkeypatch.setattr(enc, "_secret_key", None)
    monkeypatch.delenv("BINLOG_SECRET_KEY", raising=False)

    # default-key roundtrip through the CLI surface
    rc, out = _run_ctl(["encrypt", "s3cr3t/pass@word"], capsys)
    assert rc == 0
    token = out.strip().splitlines()[-1]
    rc, out = _run_ctl(["decrypt", token], capsys)
    assert rc == 0
    assert out.strip().splitlines()[-1] == "s3cr3t/pass@word"

    # wire shape: iv(16) then the literal '@' separator
    raw = base64.standard_b64decode(token)
    assert raw[16:17] == b"@"
    assert len(raw) == 16 + 1 + len("s3cr3t/pass@word")

    # deterministic iv: same iv + key -> same ciphertext; a flipped
    # iv bit changes it (CFB feedback actually uses the iv)
    iv = bytes(range(16))
    c1 = enc.encrypt("abc", iv=iv)
    assert enc.encrypt("abc", iv=iv) == c1
    assert enc.encrypt("abc", iv=bytes([1]) + iv[1:]) != c1
    assert enc.decrypt(c1) == "abc"

    # env hex key (encrypt.go initSecretKey): different key, still
    # roundtrips; ciphertext under the env key differs from default
    monkeypatch.setenv("BINLOG_SECRET_KEY", "00" * 16)
    c_env = enc.encrypt("abc", iv=iv)
    assert c_env != c1 and enc.decrypt(c_env) == "abc"

    # invalid key lengths rejected (SetSecretKey)
    import pytest as _pytest
    with _pytest.raises(ValueError, match="secretKey not valid"):
        enc.set_secret_key(b"short")
    monkeypatch.setenv("BINLOG_SECRET_KEY", "aabb")
    with _pytest.raises(ValueError, match="secretKey not valid"):
        enc.encrypt("x")
    monkeypatch.delenv("BINLOG_SECRET_KEY")

    # corrupt inputs: missing separator / truncated
    with _pytest.raises(ValueError, match="ciphertext not valid"):
        enc.decrypt(base64.standard_b64encode(b"\x00" * 17).decode())
    with _pytest.raises(ValueError, match="ciphertext not valid"):
        enc.decrypt(base64.standard_b64encode(b"\x00" * 5).decode())

    # explicit key install wins over env
    enc.set_secret_key(bytes(range(32)))
    try:
        c_set = enc.encrypt("abc", iv=iv)
        assert c_set not in (c1, c_env) and enc.decrypt(c_set) == "abc"
    finally:
        enc._secret_key = None
