"""Run logging: rank gating, file output, and the stderr invariant
(driver stdout must stay machine-parseable — bench.py prints exactly one
JSON line)."""

from nsfnet_tpu.logger import _build


def test_rank0_writes_console_and_file(tmp_path, capsys):
    log = _build("t_rank0", rank=0, log_dir=str(tmp_path))
    log.header("Hello")
    log.stage("S1", 0.05, 1000, 1e-3)
    log.info("world")
    log.warning("careful")
    files = list(tmp_path.iterdir())
    assert len(files) == 1
    text = files[0].read_text()
    assert "Hello" in text and ">>> S1" in text and "world" in text
    assert "[WARNING]" in text
    err = capsys.readouterr().err
    assert "world" in err and "alpha_evm=0.05" in err
    log.close()


def test_nonzero_rank_is_silent(tmp_path, capsys):
    log = _build("t_rank1", rank=1, log_dir=str(tmp_path))
    log.info("hidden")
    log.error("also hidden")
    assert capsys.readouterr().err == ""
    assert list(tmp_path.iterdir()) == []
    log.close()


def test_console_goes_to_stderr_not_stdout(tmp_path, capsys):
    log = _build("t_stderr", rank=0, log_dir=str(tmp_path), to_file=False)
    log.info("a message")
    out = capsys.readouterr()
    assert out.out == ""  # stdout stays clean for bench JSON
    assert "a message" in out.err
    log.close()
