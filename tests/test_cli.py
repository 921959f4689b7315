"""CLI driver round trips (counterpart of the reference example.c)."""

import numpy as np

from pangulu_tpu import cli
from pangulu_tpu.io.mmio import write_matrix
from pangulu_tpu.models import poisson2d


def _write_fixture(tmp_path):
    a = poisson2d(7)
    mtx = tmp_path / "a.mtx"
    write_matrix(mtx, a)
    rhs = tmp_path / "b.txt"
    np.savetxt(rhs, np.asarray(a.to_scipy() @ np.arange(1.0, a.n + 1)))
    return a, str(mtx), str(rhs)


def test_cli_solve_with_rhs(tmp_path, capsys):
    a, mtx, rhs = _write_fixture(tmp_path)
    rc = cli.main([
        "-f", mtx, "-nb", "16", "-r", rhs, "--dtype", "r64", "--check"])
    assert rc == 0
    out = capsys.readouterr().out
    assert "solve residual" in out


def test_cli_save_load_factor(tmp_path, capsys):
    a, mtx, rhs = _write_fixture(tmp_path)
    fpath = str(tmp_path / "f.npz")
    assert cli.main(["-f", mtx, "-nb", "16", "--dtype", "r64",
                     "--save-factor", fpath]) == 0
    assert cli.main(["--load-factor", fpath, "-r", rhs,
                     "--dtype", "r64"]) == 0


def test_cli_requires_input(tmp_path):
    import pytest

    with pytest.raises(SystemExit):
        cli.main(["-nb", "16"])
