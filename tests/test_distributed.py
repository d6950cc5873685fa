"""Multi-host (multi-process) validation (SURVEY.md §2.3 "communication
backend" row, round-1 verdict item 4): two local processes initialize
``jax.distributed`` over the coordination service (Gloo collectives on
CPU), build the global 8-device mesh (4 local devices each), run the SAME
sharded ``HPF.fit``, and must agree with each other and with a
single-process fit on the 8-device harness mesh."""

import os
import socket
import subprocess
import sys
from pathlib import Path

import numpy as np
import pandas as pd

from oracle import synth_counts

REPO = str(Path(__file__).resolve().parents[1])

WORKER = """
import os, sys
pid = int(sys.argv[1]); port = sys.argv[2]; outdir = sys.argv[3]
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
import numpy as np
import jax
jax.config.update("jax_platforms", "cpu")
sys.path.insert(0, {repo!r})
sys.path.insert(0, {tests!r})
from oracle import synth_counts
from hpfrec_tpu.parallel import distributed
mesh = distributed.initialize(coordinator_address="127.0.0.1:" + port,
                              num_processes=2, process_id=pid)
assert jax.process_count() == 2, jax.process_count()
assert len(jax.devices()) == 8, len(jax.devices())
import pandas as pd
from hpfrec_tpu import HPF
y, iu, ii = synth_counts(50, 60, nnz=800, seed=5)
df = pd.DataFrame({{"UserId": iu, "ItemId": ii, "Count": y}})
m = HPF(k=6, maxiter=10, check_every=5, stop_crit="train-llk", stop_thr=1e-10,
        random_seed=3, verbose=False, mesh=mesh)
m.fit(df)
np.savez(os.path.join(outdir, "out_%d.npz" % pid),
         Theta=m.Theta, Beta=m.Beta, llk=np.float64(m.train_llk))
"""


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_process_fit_matches_single_process(tmp_path):
    worker = tmp_path / "worker.py"
    worker.write_text(WORKER.format(repo=REPO,
                                    tests=str(Path(__file__).parent)))
    port = _free_port()
    env = {k: v for k, v in os.environ.items()
           if k not in ("XLA_FLAGS", "JAX_PLATFORMS")}
    procs = [subprocess.Popen(
        [sys.executable, str(worker), str(pid), str(port), str(tmp_path)],
        env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT)
        for pid in (0, 1)]
    logs = [p.communicate(timeout=240)[0].decode() for p in procs]
    for p, log in zip(procs, logs):
        assert p.returncode == 0, log[-3000:]

    o0 = np.load(tmp_path / "out_0.npz")
    o1 = np.load(tmp_path / "out_1.npz")
    # both processes hold the same replicated result
    np.testing.assert_allclose(o0["Theta"], o1["Theta"], rtol=1e-6)
    assert float(o0["llk"]) == float(o1["llk"])

    # and it matches a single-process fit over the same 8 (harness) devices
    from hpfrec_tpu import HPF
    from hpfrec_tpu.parallel import make_mesh

    y, iu, ii = synth_counts(50, 60, nnz=800, seed=5)
    df = pd.DataFrame({"UserId": iu, "ItemId": ii, "Count": y})
    ref = HPF(k=6, maxiter=10, check_every=5, stop_crit="train-llk",
              stop_thr=1e-10, random_seed=3, verbose=False, mesh=make_mesh())
    ref.fit(df)
    np.testing.assert_allclose(o0["Theta"], ref.Theta, rtol=1e-4, atol=1e-6)
    np.testing.assert_allclose(o0["Beta"], ref.Beta, rtol=1e-4, atol=1e-6)
    np.testing.assert_allclose(float(o0["llk"]), ref.train_llk, rtol=1e-5)
