"""Progress counter behavior (`utils/progress.py`): silent off-TTY,
spinner lines on a TTY at INFO, silent under --quiet's WARNING level."""

import io
import logging

from oarfish_tpu.utils.progress import Progress, _human


class FakeTty(io.StringIO):
    def isatty(self):
        return True


def test_human_units():
    assert _human(999) == "999"
    assert _human(1_200) == "1.20k"
    assert _human(3_400_000) == "3.40M"
    assert _human(2.5e9) == "2.50G"


def test_progress_silent_off_tty(monkeypatch, capsys):
    p = Progress("phase", unit="items")
    for _ in range(10):
        p.update(5)
    p.close()
    assert p.count == 50
    assert capsys.readouterr().err == ""


def test_progress_draws_on_tty(monkeypatch):
    fake = FakeTty()
    monkeypatch.setattr("oarfish_tpu.utils.progress.sys.stderr", fake)
    logger = logging.getLogger("oarfish_tpu")
    old = logger.level
    try:
        logger.setLevel(logging.INFO)
        p = Progress("packing", unit="records", min_interval=0.0)
        p.update(1000)
        p.update(500)
        p.close()
    finally:
        logger.setLevel(old)
    out = fake.getvalue()
    assert "packing" in out and "records" in out
    assert out.endswith("\r\x1b[K")  # line cleared on close


def test_progress_respects_quiet(monkeypatch):
    fake = FakeTty()
    monkeypatch.setattr("oarfish_tpu.utils.progress.sys.stderr", fake)
    logger = logging.getLogger("oarfish_tpu")
    old = logger.level
    try:
        logger.setLevel(logging.WARNING)  # --quiet
        p = Progress("phase", min_interval=0.0)
        p.update(100)
        p.close()
        assert fake.getvalue() == ""
    finally:
        logger.setLevel(old)
