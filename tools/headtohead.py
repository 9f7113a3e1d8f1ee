"""Engine (one Ray pipeline, all counties) vs reference (sequential
one-county-per-process, its processAll.sh model) on identical input."""
import time, subprocess, os, sys, json
sys.path.insert(0, "/root/repo")
from tools.conformance_noderun import stage_reference, fixture_to_inputs, STAGE
from osm_intersections_ray.sources.synthetic import ensure_fixtures
import pyarrow.parquet as pq

label = sys.argv[1] if len(sys.argv) > 1 else "sf0.1r8"
fx = ensure_fixtures(f"/root/testdata/{label}")
counties = sorted(set(pq.read_table(fx+"/ways.parquet", columns=["county"])["county"].to_pylist()))
print(f"{label}: {len(counties)} counties")

# reference: sequential node processes
stage_reference()
t0 = time.time()
total_ref_rows = 0
for county in counties:
    fname = fixture_to_inputs(fx, county)
    out = os.path.join(STAGE, "output", "o.json")
    subprocess.run(["node","js/geo.js",f"input/{fname}", out], cwd=STAGE,
                   check=True, capture_output=True)
    total_ref_rows += len(json.load(open(out))["features"])
t_ref = time.time() - t0
print(f"reference sequential: {t_ref:.1f}s rows={total_ref_rows}")

# engine: one pipeline
import ray
ray.init(address="local", num_cpus=32, include_dashboard=False, logging_level="ERROR")
from ray.data import DataContext; DataContext.get_current().enable_progress_bars=False
from osm_intersections_ray.pipelines.intersections import intersections_pipeline
t0 = time.time()
n = intersections_pipeline(fx).count()
t_eng = time.time() - t0
print(f"engine (32 cpus, one pipeline): {t_eng:.1f}s rows={n}")
print(f"speedup: {t_ref/t_eng:.2f}x")
ray.shutdown()
