"""Roofline utility + animate CLI smoke tests."""
import numpy as np

from tpurt.utils.roofline import report, traversal_cost


def test_traversal_cost_model():
    c = traversal_cost(1024, 1024, 1, True, 2, survivors_per_pass=20)
    assert c.passes == 6
    assert c.tiles == 1024
    lb = c.lower_bound_ms()
    assert 0 < lb["bound_ms"] < 1000
    txt = report(500.0, height=1024, width=1024, max_depth=1, shadows=True,
                 n_lights=2, survivors_per_pass=20)
    assert "efficiency" in txt


def test_cli_animate(tmp_path):
    from tpurt.cli import main

    out = str(tmp_path / "f_{:03d}.png")
    main(["animate", "--config", "1", "--res", "16x16", "--frames", "3",
          "--out", out])
    import os

    assert os.path.exists(str(tmp_path / "f_002.png"))
