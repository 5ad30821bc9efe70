"""Log parser: round-trips the Solve loop's actual output format."""

from mscnn_tpu.train import loop as LP
from mscnn_tpu.utils import parse_log as PL
import jax.numpy as jnp


def test_parse_real_loop_output(tmp_path):
    logs = []
    state = {"params": {"w": jnp.zeros(2)},
             "solver": {"it": jnp.asarray(0), "h1": {"w": jnp.zeros(2)}}}

    def step(state, batch, key):
        it = state["solver"]["it"]
        new = {"params": state["params"],
               "solver": {"it": it + 1, "h1": state["solver"]["h1"]}}
        return new, {"loss": 5.0 / (1.0 + it), "lr": jnp.asarray(0.01),
                     "cls_accuracy": jnp.asarray(0.5)}

    spec = LP.LoopSpec(max_iter=3, display=1,
                       snapshot_prefix=str(tmp_path / "s"))
    LP.solve(step, state, lambda: {}, spec, log=logs.append)
    rows = PL.parse_log("\n".join(logs))
    assert len(rows) == 3
    assert rows[0]["iteration"] == 0.0
    assert rows[0]["loss"] == 5.0
    assert rows[1]["train_cls_accuracy"] == 0.5
    assert rows[2]["lr"] == 0.01

    out = tmp_path / "log.csv"
    PL.write_csv(rows, str(out))
    header = out.read_text().splitlines()[0]
    assert "iteration" in header and "train_cls_accuracy" in header


def test_cli_plot_log(tmp_path, capsys):
    from mscnn_tpu import cli

    log = tmp_path / "train.log"
    log.write_text("\n".join(
        f"Iteration {i} (2.0 iter/s), loss = {1.0 / (i + 1):.4f}, "
        f"lr = 0.001\n    Train net output: cls_accuracy = 0.{5 + i}"
        for i in range(4)))
    out = tmp_path / "curves.png"
    rc = cli.main(["plot_log", "--log", str(log), "--out", str(out),
                   "--keys", "loss,train_cls_accuracy"])
    assert rc == 0
    assert out.exists() and out.stat().st_size > 1000
    assert "4 points" in capsys.readouterr().out
