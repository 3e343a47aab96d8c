// Golden-data generator for the reference's prebuilt intersection library.
//
// Links /root/reference/prebuilt/libIntersect_linux_x64.a (the authoritative
// binary whose semantics the JAX ops in cge_tpu/ops/intersect.py replicate)
// and dumps results for deterministic pseudo-random inputs to a binary file
// consumed by tests/test_intersect_golden.py.
//
// The struct definitions below mirror the public ABI the prebuilt library
// was compiled against (/root/reference/src/common.h, framework/ray.h,
// framework/mesh.h) — they are the API boundary, not copied logic.

#include <glm/glm.hpp>
#include <cfloat>
#include <cstdint>
#include <cstdio>
#include <memory>
#include <vector>

struct Image;  // opaque; kernels only copy the shared_ptr

struct Material {
    glm::vec3 kd { 1.0f };
    glm::vec3 ks { 0.0f };
    float shininess { 1.0f };
    float transparency { 1.0f };
    std::shared_ptr<Image> kdTexture;
};

struct Ray {
    glm::vec3 origin { 0.0f };
    glm::vec3 direction { 0.0f, 0.0f, -1.0f };
    float t { FLT_MAX };
};

struct HitInfo {
    glm::vec3 normal;
    glm::vec3 barycentricCoord;
    glm::vec2 texCoord;
    Material material;
};

struct Plane {
    float D = 0.0f;
    glm::vec3 normal { 0.0f, 1.0f, 0.0f };
};

struct AxisAlignedBox {
    glm::vec3 lower { 0.0f };
    glm::vec3 upper { 1.0f };
};

struct Sphere {
    glm::vec3 center { 0.0f };
    float radius = 1.0f;
    Material material;
};

bool intersectRayWithPlane(const Plane& plane, Ray& ray);
bool pointInTriangle(const glm::vec3& v0, const glm::vec3& v1,
                     const glm::vec3& v2, const glm::vec3& n,
                     const glm::vec3& p);
Plane trianglePlane(const glm::vec3& v0, const glm::vec3& v1,
                    const glm::vec3& v2);
bool intersectRayWithTriangle(const glm::vec3& v0, const glm::vec3& v1,
                              const glm::vec3& v2, Ray& ray, HitInfo& hitInfo);
bool intersectRayWithShape(const Sphere& sphere, Ray& ray, HitInfo& hitInfo);
bool intersectRayWithShape(const AxisAlignedBox& box, Ray& ray);

// Deterministic LCG so Python can regenerate identical inputs.
static uint64_t lcg_state = 0x243F6A8885A308D3ull;
static float frand() {  // uniform in [0, 1)
    lcg_state = lcg_state * 6364136223846793005ull + 1442695040888963407ull;
    return (float)((lcg_state >> 40) & 0xFFFFFF) / 16777216.0f;
}
static float frange(float lo, float hi) { return lo + (hi - lo) * frand(); }
static glm::vec3 vrand(float lo, float hi) {
    float x = frange(lo, hi), y = frange(lo, hi), z = frange(lo, hi);
    return { x, y, z };
}

int main() {
    FILE* f = fopen("golden_intersect.bin", "wb");
    const int N = 4096;

    // --- triangles
    for (int i = 0; i < N; i++) {
        glm::vec3 v0 = vrand(-2, 2), v1 = vrand(-2, 2), v2 = vrand(-2, 2);
        Ray ray;
        ray.origin = vrand(-3, 3);
        ray.direction = vrand(-1, 1);
        if (i % 3 == 0) ray.direction = glm::normalize(ray.direction);
        ray.t = (i % 4 == 0) ? frange(0.1f, 5.0f) : FLT_MAX;
        // aim half the rays at the triangle so hits are common
        if (i % 2 == 0)
            ray.direction = (v0 + v1 + v2) / 3.0f
                            + vrand(-0.3f, 0.3f) - ray.origin;
        float tin = ray.t;
        HitInfo h {};
        bool hit = intersectRayWithTriangle(v0, v1, v2, ray, h);
        float rec[14] = { v0.x, v0.y, v0.z, v1.x, v1.y, v1.z,
                          v2.x, v2.y, v2.z, ray.origin.x, ray.origin.y,
                          ray.origin.z, tin, 0 };
        fwrite(rec, 4, 14, f);
        float dir[3] = { ray.direction.x, ray.direction.y, ray.direction.z };
        fwrite(dir, 4, 3, f);
        float out[2] = { hit ? 1.0f : 0.0f, ray.t };
        fwrite(out, 4, 2, f);
    }

    // --- spheres (normalized directions, as the kernel assumes)
    for (int i = 0; i < N; i++) {
        Sphere s;
        s.center = vrand(-2, 2);
        s.radius = frange(0.1f, 2.0f);
        Ray ray;
        ray.origin = (i % 5 == 0) ? s.center + vrand(-0.1f, 0.1f)  // inside
                                  : vrand(-4, 4);
        glm::vec3 target = s.center + vrand(-2.0f, 2.0f) * s.radius;
        ray.direction = glm::normalize((i % 2 == 0) ? target - ray.origin
                                                    : vrand(-1, 1));
        ray.t = (i % 4 == 0) ? frange(0.1f, 5.0f) : FLT_MAX;
        float tin = ray.t;
        HitInfo h {};
        bool hit = intersectRayWithShape(s, ray, h);
        float rec[11] = { s.center.x, s.center.y, s.center.z, s.radius,
                          ray.origin.x, ray.origin.y, ray.origin.z,
                          ray.direction.x, ray.direction.y, ray.direction.z,
                          tin };
        fwrite(rec, 4, 11, f);
        float out[5] = { hit ? 1.0f : 0.0f, ray.t,
                         h.normal.x, h.normal.y, h.normal.z };
        fwrite(out, 4, 5, f);
    }

    // --- AABBs (incl. zero-direction components and inside-origin cases)
    for (int i = 0; i < N; i++) {
        AxisAlignedBox box;
        glm::vec3 a = vrand(-2, 2), b = vrand(-2, 2);
        box.lower = glm::min(a, b);
        box.upper = glm::max(a, b);
        Ray ray;
        ray.origin = (i % 5 == 0)
            ? (box.lower + box.upper) * 0.5f + vrand(-0.1f, 0.1f)  // inside
            : vrand(-4, 4);
        ray.direction = vrand(-1, 1);
        if (i % 3 == 0) ray.direction.x = 0.0f;
        if (i % 7 == 0) ray.direction.y = 0.0f;
        if (i % 11 == 0) ray.direction = glm::normalize(ray.direction);
        if (i % 2 == 0)
            ray.direction = (box.lower + box.upper) * 0.5f - ray.origin;
        ray.t = (i % 4 == 0) ? frange(0.1f, 5.0f) : FLT_MAX;
        float tin = ray.t;
        bool hit = intersectRayWithShape(box, ray);
        float rec[11] = { box.lower.x, box.lower.y, box.lower.z,
                          box.upper.x, box.upper.y, box.upper.z,
                          ray.origin.x, ray.origin.y, ray.origin.z,
                          0, tin };
        fwrite(rec, 4, 11, f);
        float dir[3] = { ray.direction.x, ray.direction.y, ray.direction.z };
        fwrite(dir, 4, 3, f);
        float out[2] = { hit ? 1.0f : 0.0f, ray.t };
        fwrite(out, 4, 2, f);
    }

    // --- planes + pointInTriangle + trianglePlane
    for (int i = 0; i < N; i++) {
        glm::vec3 v0 = vrand(-2, 2), v1 = vrand(-2, 2), v2 = vrand(-2, 2);
        Plane pl = trianglePlane(v0, v1, v2);
        glm::vec3 p = (i % 2 == 0)
            ? v0 * frand() + v1 * frand() + v2 * frand()
            : vrand(-2, 2);
        bool inside = pointInTriangle(v0, v1, v2, pl.normal, p);
        Ray ray;
        ray.origin = vrand(-3, 3);
        ray.direction = vrand(-1, 1);
        ray.t = (i % 4 == 0) ? frange(0.1f, 5.0f) : FLT_MAX;
        float tin = ray.t;
        bool phit = intersectRayWithPlane(pl, ray);
        float rec[24] = { v0.x, v0.y, v0.z, v1.x, v1.y, v1.z,
                          v2.x, v2.y, v2.z, p.x, p.y, p.z,
                          pl.D, pl.normal.x, pl.normal.y, pl.normal.z,
                          inside ? 1.0f : 0.0f,
                          ray.origin.x, ray.origin.y, ray.origin.z,
                          ray.direction.x, ray.direction.y, ray.direction.z,
                          tin };
        fwrite(rec, 4, 24, f);
        float out[2] = { phit ? 1.0f : 0.0f, ray.t };
        fwrite(out, 4, 2, f);
    }

    fclose(f);
    printf("wrote golden_intersect.bin\n");
    return 0;
}
