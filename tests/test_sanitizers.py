"""Sanitizer builds that actually RUN (the reference ships opt-in
ASan/UBSan flags, framework/cmake/Sanitizers.cmake:7-26; round-1 review
flagged ours as decorative). Two first-party native surfaces:

  1. the host runtime (cge_tpu/native/cge_host.cpp): OBJ parse with quads/
     materials/dissolve, cluster build, BVH build — compiled standalone
     with -fsanitize=address,undefined and driven by a tiny C++ main;
  2. the golden oracle harness (tools/oracle): built with sanitizers and
     rendering a real 16x16 frame (the reference sources + prebuilt
     intersection archive run uninstrumented underneath, which ASan
     supports).
"""

import os
import subprocess
import pytest

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(HERE)
NATIVE = os.path.join(REPO, "cge_tpu", "native")

OBJ = """\
mtllib san.mtl
v 0 0 0
v 1 0 0
v 1 1 0
v 0 1 0
v 0 0 1
vn 0 0 1
vt 0 0
vt 1 0
vt 1 1
vt 0 1
usemtl red
f 1/1/1 2/2/1 3/3/1 4/4/1
usemtl glass
f 1/1/1 2/2/1 5/1/1
"""

MTL = """\
newmtl red
Kd 0.8 0.1 0.1
Ks 0.2 0.2 0.2
Ns 16
newmtl glass
Kd 0.2 0.2 0.9
d 0.45
"""

MAIN = """\
#include <cstdio>
#include <cstdlib>
#include <vector>
extern "C" {
void* cge_load_obj(const char* path, int center_and_normalize);
int cge_n_submeshes(void* h);
void cge_submesh_counts(void* h, int i, int* nv, int* nt);
void cge_submesh_data(void* h, int i, float* pos, float* nrm, float* uv,
                      int* tris);
int cge_submesh_material(void* h, int i, float* out8, char* map_kd, int cap);
void cge_release(void* h);
int cge_build_clusters(const float* centers, int n, int cluster_size,
                       int* out, int cap);
int cge_build_bvh(const float* lo, const float* hi, const float* centers,
                  int n, int sah, int capacity, float* node_lo,
                  float* node_hi, int* node_meta, int* perm, int* stats);
}
int main(int argc, char** argv) {
    void* h = cge_load_obj(argv[1], 1);
    if (!h) { fprintf(stderr, "load failed\\n"); return 1; }
    int n = cge_n_submeshes(h);
    for (int i = 0; i < n; ++i) {
        int nv = 0, nt = 0;
        cge_submesh_counts(h, i, &nv, &nt);
        std::vector<float> pos(3 * nv), nrm(3 * nv), uv(2 * nv);
        std::vector<int> tris(3 * nt);
        cge_submesh_data(h, i, pos.data(), nrm.data(), uv.data(),
                         tris.data());
        float mat[8]; char tex[256];
        cge_submesh_material(h, i, mat, tex, sizeof tex);
    }
    cge_release(h);
    // cluster + BVH builders on a small random soup
    const int N = 300;
    std::vector<float> lo(3 * N), hi(3 * N), c(3 * N);
    for (int i = 0; i < 3 * N; ++i) {
        float v = float(rand()) / float(RAND_MAX);
        c[i] = v; lo[i] = v - 0.01f; hi[i] = v + 0.01f;
    }
    std::vector<int> perm(4096 * 128, -2);
    int L = cge_build_clusters(c.data(), N, 128, perm.data(),
                               int(perm.size()));
    if (L <= 0) { fprintf(stderr, "clusters failed\\n"); return 1; }
    for (int sah = 0; sah <= 1; ++sah) {
        std::vector<float> nlo(3 * 4096), nhi(3 * 4096);
        std::vector<int> meta(6 * 4096), p(N), stats(3);
        int nodes = cge_build_bvh(lo.data(), hi.data(), c.data(), N, sah,
                                  4096, nlo.data(), nhi.data(), meta.data(),
                                  p.data(), stats.data());
        if (nodes <= 0) { fprintf(stderr, "bvh failed\\n"); return 1; }
    }
    printf("SANITIZED_OK submeshes=%d clusters=%d\\n", n, L);
    return 0;
}
"""


@pytest.mark.slow
def test_host_runtime_under_asan_ubsan(tmp_path):
    obj = tmp_path / "san.obj"
    obj.write_text(OBJ)
    (tmp_path / "san.mtl").write_text(MTL)
    main = tmp_path / "main.cpp"
    main.write_text(MAIN)
    exe = tmp_path / "san_test"
    subprocess.run(
        ["g++", "-O1", "-g", "-std=c++17", "-Wall", "-Wextra",
         "-fsanitize=address,undefined", "-fno-omit-frame-pointer",
         os.path.join(NATIVE, "cge_host.cpp"), str(main), "-o", str(exe)],
        check=True, timeout=300, capture_output=True)
    r = subprocess.run([str(exe), str(obj)], capture_output=True, text=True,
                       timeout=120,
                       env=dict(os.environ,
                                UBSAN_OPTIONS="halt_on_error=1",
                                ASAN_OPTIONS="detect_leaks=1"))
    assert r.returncode == 0, f"sanitized run failed:\n{r.stdout}\n{r.stderr}"
    assert "SANITIZED_OK" in r.stdout


@pytest.mark.slow
def test_oracle_under_asan_ubsan(tmp_path):
    oracle_dir = os.path.join(REPO, "tools", "oracle")
    build = os.path.join(oracle_dir, "build.sh")
    if not os.path.exists("/root/reference/src/render.cpp"):
        pytest.skip("reference tree unavailable")
    # rebuild the oracle with sanitizers into a temp binary
    exe = tmp_path / "oracle_san"
    r = subprocess.run(
        ["bash", build], capture_output=True, text=True, timeout=600,
        env=dict(os.environ, OUT=str(exe),
                 EXTRA_FLAGS="-fsanitize=address,undefined "
                             "-fno-omit-frame-pointer -g"))
    assert r.returncode == 0 and exe.exists(), (
        f"sanitized oracle build failed: {r.stderr[-600:]}")
    out = tmp_path / "o.raw"
    # detect_leaks=0: LeakSanitizer correctly reports that the REFERENCE
    # leaks its BVH node vectors (createBVH allocations are never freed,
    # bounding_volume_hierarchy.cpp:147) — a reference bug, not ours; this
    # test checks memory-safety of execution, not third-party leaks.
    r = subprocess.run(
        [str(exe), "cornell_box", "16", "16", "shading,hard_shadow", "50",
         "3", "0,0,0", "20,20,0", str(out)],
        capture_output=True, text=True, timeout=300,
        env=dict(os.environ, UBSAN_OPTIONS="halt_on_error=1",
                 ASAN_OPTIONS="detect_leaks=0"))
    assert r.returncode == 0, f"sanitized oracle failed:\n{r.stderr[-800:]}"
    assert out.exists()
