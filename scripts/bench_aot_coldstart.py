"""AOT serving-engine cold-start measurement (VERDICT r3 item 8).

The reference's TensorRT path pays its build cost offline and then
deserializes a fully-compiled engine at serving startup
(reference onnx4tensorrt/onnx2tensorrt.py:44-203). The TPU analog is the
exported StableHLO + params artifact (deploy/aot.py): loading saves model
code and TRACING, but XLA still compiles the graph on first call — unless a
persistent compilation cache is warm. This script measures all three rows:

  export          export_artifact wall time (offline, like trtexec build)
  cold start      fresh process + EMPTY compile cache: load_artifact +
                  first call (the true first-boot number)
  warm restart    fresh process + warm persistent cache: load_artifact +
                  first call (the realistic serving-restart number —
                  deploy the cache directory next to the artifact)

    python scripts/bench_aot_coldstart.py [batch] [beam] [steps]
"""
import json
import os
import shutil
import subprocess
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

_CHILD = r"""
import json, os, sys, time
sys.path.insert(0, %(repo)r)
t_imp = time.perf_counter()
import jax, jax.numpy as jnp, numpy as np
cache = %(cache)r
if cache:
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
from on_device_image_captioning_tpu.deploy.aot import load_artifact
t0 = time.perf_counter()
call, params = load_artifact(%(path)r)
t_load = time.perf_counter() - t0
params = jax.device_put(params)
imgs = jnp.asarray(np.random.default_rng(0).integers(
    0, 256, (%(batch)d, 384, 384, 3), dtype=np.uint8))
jax.device_get(jax.tree.leaves(params)[0])  # H2D done before the clock
t0 = time.perf_counter()
toks, lens = call(params, imgs)
jax.device_get(toks)
t_first = time.perf_counter() - t0
t0 = time.perf_counter()
toks, lens = call(params, imgs)
jax.device_get(toks)
t_steady = time.perf_counter() - t0
print("CHILD " + json.dumps({
    "load_s": round(t_load, 3), "first_call_s": round(t_first, 3),
    "steady_call_s": round(t_steady, 4),
}))
"""


def run_child(path, cache, batch):
    code = _CHILD % {"repo": REPO, "cache": cache, "path": path,
                     "batch": batch}
    t0 = time.perf_counter()
    proc = subprocess.run(
        [sys.executable, "-c", code], cwd=REPO,
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
    )
    wall = time.perf_counter() - t0
    line = [l for l in proc.stdout.splitlines() if l.startswith("CHILD ")]
    if proc.returncode != 0 or not line:
        print(proc.stdout[-2000:])
        raise SystemExit("child failed")
    out = json.loads(line[0][6:])
    out["process_wall_s"] = round(wall, 2)
    return out


def main():
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    beam = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    steps = int(sys.argv[3]) if len(sys.argv) > 3 else 20

    import jax
    import jax.numpy as jnp

    repo_cache = os.path.join(REPO, ".jax_cache")
    jax.config.update("jax_compilation_cache_dir", repo_cache)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    import dataclasses

    from on_device_image_captioning_tpu.config import (
        DecodeConfig, end_expansionnet_v2_coco,
    )
    from on_device_image_captioning_tpu.deploy.aot import export_artifact
    from on_device_image_captioning_tpu.models import end_to_end

    cfg = end_expansionnet_v2_coco(compute_dtype=jnp.bfloat16)
    cfg = dataclasses.replace(
        cfg, swin=dataclasses.replace(cfg.swin, attention_impl="fused")
    )
    dcfg = DecodeConfig(beam_size=beam, how_many_outputs=1, max_seq_len=steps)
    params = end_to_end.init(jax.random.PRNGKey(0), cfg)
    params = end_to_end.prepare_inference_params(params, cfg)

    art = tempfile.mkdtemp(prefix="aot_artifact_")
    t0 = time.perf_counter()
    export_artifact(art, params, cfg, dcfg, batch)
    t_export = time.perf_counter() - t0
    size = sum(
        os.path.getsize(os.path.join(art, f)) for f in os.listdir(art)
    )
    print(f"export: {t_export:.1f}s, artifact {size / 1e6:.0f} MB "
          f"(b{batch} beam{beam} L{steps}, Swin-L/384 bf16 fused)")

    cold_cache = tempfile.mkdtemp(prefix="aot_cold_cache_")
    try:
        cold = run_child(art, cold_cache, batch)
        print(f"cold start  (empty XLA cache): {json.dumps(cold)}")
        warm = run_child(art, cold_cache, batch)
        print(f"warm restart (cache from cold run): {json.dumps(warm)}")
    finally:
        shutil.rmtree(cold_cache, ignore_errors=True)
        shutil.rmtree(art, ignore_errors=True)


if __name__ == "__main__":
    main()
