"""Map the Newton-Schulz convergence envelope of the DEPLOYED iteration
(trainer._ns_residuals math) in f32: residual vs (cond, iters, scaling).

Question from the on-chip fallback demo (2026-08-20): at breach time the
covariance conditioning was already ~5e4; the dr->d demotion could not
stop the feedback because ns15 under-converges on EXACT batch stats at
that conditioning. Which ladder rung restores convergence, and up to
what conditioning: fro scaling? more iterations? both?
"""
import numpy as np

rng = np.random.default_rng(0)
C = 256
eps = 1e-5

def make_spd(cond, mode="loguniform"):
  q, _ = np.linalg.qr(rng.standard_normal((C, C)))
  if mode == "loguniform":
    lam = np.exp(rng.uniform(0, np.log(cond), C))
  else:  # two-cluster: a few huge directions (the explosion's shape)
    lam = np.ones(C); lam[:8] = cond
  lam = lam / lam.max()
  a = (q * lam) @ q.T
  return 0.5 * (a + a.T)

def residual(cov, iters, scaling, dtype):
  cov = cov.astype(dtype)
  ident = np.eye(C, dtype=dtype)
  mean_diag = max(np.trace(cov) / C, 0.0)
  neg_diag = max(-np.min(np.diagonal(cov)), 0.0)
  a = cov + (eps * mean_diag + 2.0 * neg_diag + 1e-12) * ident
  tr = np.trace(a) if scaling == "trace" else np.linalg.norm(a)
  y, z = (a / tr).astype(dtype), ident.copy()
  for _ in range(iters):
    t = (0.5 * (3.0 * ident - z @ y)).astype(dtype)
    y, z = (y @ t).astype(dtype), (t @ z).astype(dtype)
  w = z / np.sqrt(tr)
  return float(np.max(np.abs(w @ cov @ w.T - ident)))

print(f"{'cond':>8} {'spec':>10} | " + " ".join(
    f"{s}/ns{i}".rjust(12) for s in ("trace", "fro") for i in (15, 30, 60)))
for spec in ("loguniform", "cluster"):
  for cond in (1e3, 1e4, 5e4, 1e5, 4e5, 1e6):
    cov = make_spd(cond, spec)
    row = [f"{residual(cov, i, s, np.float32):12.2e}"
           for s in ("trace", "fro") for i in (15, 30, 60)]
    print(f"{cond:8.0e} {spec:>10} | " + " ".join(row))
# f64 sanity at the worst point: is f32 rounding or iteration count the binder?
cov = make_spd(4e5, "loguniform")
for i in (15, 30, 60):
  print(f"f64 loguniform cond=4e5 ns{i}: trace {residual(cov,i,'trace',np.float64):.2e}"
        f"  fro {residual(cov,i,'fro',np.float64):.2e}")
