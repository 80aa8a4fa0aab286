"""Repro for tests/test_chaining.py::test_lin1_inflates_se_and_bakes_atmosphere."""
import os
import shutil
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
)
import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import numpy as np

from archnemesis_tpu.retrievals import make_retrieval_setup, retrieval_nemesis

DECK = "tests/fixtures/jupiter_nadir"
base = tempfile.mkdtemp(prefix="lin1repro")
dst = os.path.join(base, "deck")
shutil.copytree(DECK, dst)
shutil.copytree("tests/fixtures/ktables", os.path.join(base, "ktables"))
res0 = retrieval_nemesis(dst, "cirstest", niter=1, write_outputs=True)
shutil.copyfile(os.path.join(dst, "cirstest.raw"), os.path.join(dst, "cirstest.pre"))

res_plain = retrieval_nemesis(dst, "cirstest", lin=0, niter=0, write_outputs=False)
res1 = retrieval_nemesis(dst, "cirstest", lin=1, niter=0, write_outputs=False)
print("yn differ:", not np.allclose(res1.yn, res_plain.yn, rtol=1e-9))
s = make_retrieval_setup(dst, "cirstest")
resid = res1.yn - s.y
chisq_uninflated = float(resid @ np.linalg.solve(s.se, resid) / s.y.shape[0])
print("res1.chisq          =", res1.chisq)
print("chisq_uninflated    =", chisq_uninflated)
print("strictly smaller:", res1.chisq < chisq_uninflated)
