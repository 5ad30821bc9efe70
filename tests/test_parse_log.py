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
