"""Persisted-index cache hygiene (r15: ADVICE r14 #1/#2, VERDICT r14 #4).

Covers fsutil.secure_cache_root (0700 + ownership/mode verification),
fsutil.dir_lock (single-writer exclusion, dead-holder steal), and
fsutil.reap_stale_cache_dirs (bounded retention, live-key and live-writer
exemption, crash-safe delete).  Pure local-FS tests — no Spark session.
"""

from __future__ import annotations

import os
import stat
import subprocess
import sys
import time
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from hedera_etl_spark import fsutil  # noqa: E402


def test_secure_cache_root_uses_xdg_and_mode_0700(tmp_path, monkeypatch):
    monkeypatch.setenv("XDG_CACHE_HOME", str(tmp_path / "xdg"))
    root = fsutil.secure_cache_root("semdedup")
    assert root == str(tmp_path / "xdg" / "hedera_etl_spark" / "semdedup")
    for d in (Path(root), Path(root).parent):
        assert stat.S_IMODE(os.stat(d).st_mode) == 0o700
    # idempotent reuse of a clean dir
    assert fsutil.secure_cache_root("semdedup") == root


def test_secure_cache_root_rejects_world_writable(tmp_path, monkeypatch):
    monkeypatch.setenv("XDG_CACHE_HOME", str(tmp_path / "xdg"))
    app = tmp_path / "xdg" / "hedera_etl_spark"
    app.mkdir(parents=True)
    os.chmod(app, 0o777)
    with pytest.raises(RuntimeError, match="group/other-writable"):
        fsutil.secure_cache_root("semdedup")


@pytest.mark.skipif(os.getuid() != 0, reason="chown needs root")
def test_secure_cache_root_rejects_foreign_owner(tmp_path, monkeypatch):
    monkeypatch.setenv("XDG_CACHE_HOME", str(tmp_path / "xdg"))
    app = tmp_path / "xdg" / "hedera_etl_spark"
    app.mkdir(parents=True, mode=0o700)
    os.chown(app, 12345, 12345)
    with pytest.raises(RuntimeError, match="owned by uid 12345"):
        fsutil.secure_cache_root("semdedup")


def test_dir_lock_excludes_and_releases(tmp_path):
    target = str(tmp_path / "idx")
    with fsutil.dir_lock(target):
        assert os.path.exists(fsutil._lock_path(target))
        with pytest.raises(TimeoutError, match="write lock"):
            with fsutil.dir_lock(target, timeout=0.3, poll=0.05):
                pass
    # released on exit
    assert not os.path.exists(fsutil._lock_path(target))
    with fsutil.dir_lock(target, timeout=0.3):
        pass


def test_dir_lock_steals_from_dead_holder(tmp_path):
    target = str(tmp_path / "idx")
    # a real process that took the lock and died without releasing
    child = subprocess.run(
        [
            sys.executable,
            "-c",
            (
                "import sys; sys.path.insert(0, %r); "
                "from hedera_etl_spark import fsutil; "
                "fsutil.dir_lock(%r).__enter__()"
            )
            % (str(Path(__file__).resolve().parent.parent), target),
        ],
        check=True,
    )
    assert child.returncode == 0
    assert os.path.exists(fsutil._lock_path(target))
    t0 = time.monotonic()
    with fsutil.dir_lock(target, timeout=5.0):
        pass
    assert time.monotonic() - t0 < 2.0, "stale lock must be stolen, not waited out"


def test_dir_lock_released_on_exception(tmp_path):
    target = str(tmp_path / "idx")
    with pytest.raises(ValueError):
        with fsutil.dir_lock(target):
            raise ValueError("boom")
    assert not os.path.exists(fsutil._lock_path(target))


def _mk(root: Path, name: str, age_sec: float) -> Path:
    d = root / name
    d.mkdir()
    (d / "_meta.json").write_text("{}")
    old = time.time() - age_sec
    os.utime(d, (old, old))
    return d


def test_reap_keeps_newest_and_live_key(tmp_path):
    root = tmp_path
    for i, age in enumerate([500, 400, 300, 200, 100]):
        _mk(root, f"semdedup-v1-{i}", age)
    _mk(root, "other-family", 1000)  # different prefix: untouched
    reaped = fsutil.reap_stale_cache_dirs(
        str(root), "semdedup-v1-", keep=2, exclude=("semdedup-v1-0",)
    )
    # newest two (3, 4) kept by retention; 0 kept by exclude; 1, 2 reaped
    assert sorted(reaped) == ["semdedup-v1-1", "semdedup-v1-2"]
    left = sorted(p.name for p in root.iterdir())
    assert "semdedup-v1-0" in left and "semdedup-v1-3" in left and "semdedup-v1-4" in left
    assert "other-family" in left
    assert not any(n.endswith(".__reap") for n in left), "debris must be swept"


def test_reap_spares_dir_with_live_writer(tmp_path):
    root = tmp_path
    locked = _mk(root, "semdedup-v1-locked", 9999)
    _mk(root, "semdedup-v1-new", 1)
    lock = fsutil.dir_lock(str(locked))
    lock.__enter__()
    try:
        reaped = fsutil.reap_stale_cache_dirs(str(root), "semdedup-v1-", keep=1)
        assert reaped == []
        assert locked.exists()
    finally:
        lock.__exit__(None, None, None)
    # writer gone -> next reap takes it
    reaped = fsutil.reap_stale_cache_dirs(str(root), "semdedup-v1-", keep=1)
    assert reaped == ["semdedup-v1-locked"]


def test_reap_missing_root_is_noop(tmp_path):
    assert fsutil.reap_stale_cache_dirs(str(tmp_path / "nope"), "x-") == []
