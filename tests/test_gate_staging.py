"""Gate staging-dir hygiene (r13 ADVICE): env override for
spawn-started workers, and the claim step that refuses symlinked or
foreign-owned pre-created directories."""

import os

import pytest

from smashed_spark.plans.queries_more import (
    _bind_io_zdocs_path,
    _claim_io_zdocs_dir,
)
from smashed_spark.plans.queries_scale import _bind_media_gate_path


def test_env_override_beats_pid_keying(monkeypatch, tmp_path):
    target = str(tmp_path / "pinned")
    monkeypatch.setenv("SMASHED_IO_ZDOCS_DIR", target)
    assert _bind_io_zdocs_path() == target
    monkeypatch.delenv("SMASHED_IO_ZDOCS_DIR")
    assert str(os.getpid()) in _bind_io_zdocs_path()

    monkeypatch.setenv("SMASHED_MEDIA_GATE_DIR", target)
    assert _bind_media_gate_path() == target
    monkeypatch.delenv("SMASHED_MEDIA_GATE_DIR")
    assert str(os.getpid()) in _bind_media_gate_path()


def test_claim_creates_private_dir(tmp_path):
    path = str(tmp_path / "fresh")
    _claim_io_zdocs_dir(path)
    assert os.path.isdir(path)
    assert os.stat(path).st_mode & 0o777 == 0o700
    # idempotent on our own dir
    _claim_io_zdocs_dir(path)


def test_claim_refuses_symlink(tmp_path):
    real = tmp_path / "real"
    real.mkdir()
    link = tmp_path / "link"
    link.symlink_to(real)
    with pytest.raises(RuntimeError, match="symlink"):
        _claim_io_zdocs_dir(str(link))
    # the env-var name surfaces in the remediation message
    with pytest.raises(RuntimeError, match="SMASHED_MEDIA_GATE_DIR"):
        _claim_io_zdocs_dir(
            str(link), env_var="SMASHED_MEDIA_GATE_DIR"
        )
