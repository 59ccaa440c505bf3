import sys
sys.path.insert(0, "/root/repo")
from bench import bench
for B, T in ((16, 64), (4, 128)):
    v = bench(B=B, T=T, iters=3)
    print(f"B={B} T={T}: {v:.0f} win/s", flush=True)
