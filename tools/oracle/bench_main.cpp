// Timing harness around the REAL reference renderer — the baseline side of
// bench.py. Mirrors the CLI flow (/root/reference/src/main.cpp:478-535) and
// the "Render to file" timing (/root/reference/src/main.cpp:232-236), built
// Release-style (-O2 -DNDEBUG -fopenmp) so the OpenMP scanline loop
// (/root/reference/src/render.cpp:277-280) is active.
//
// Usage: bench_oracle <scene> <W> <H> <features_csv> <reps>
// Prints per-rep ms to stderr and "BEST_MS <ms>" to stdout.

#include "config.h"
#include "scene.h"
#include "bvh_interface.h"
#include "render.h"
#include "screen.h"
#include <framework/trackball.h>
#include <framework/window.h>
#include <chrono>
#include <cstdio>
#include <cstring>
#include <string>

int main(int argc, char** argv)
{
    if (argc < 6) {
        fprintf(stderr, "usage: bench_oracle scene W H features reps\n");
        return 1;
    }
    const std::string sceneName = argv[1];
    const int W = atoi(argv[2]);
    const int H = atoi(argv[3]);
    const std::string feats = argv[4];
    const int reps = atoi(argv[5]);

    Features features {};
    auto has = [&](const char* f) { return feats.find(f) != std::string::npos; };
    features.enableShading = has("shading");
    features.enableRecursive = has("recursive");
    features.enableHardShadow = has("hard_shadow");
    features.enableSoftShadow = has("soft_shadow");
    features.enableNormalInterp = has("normal_interp");
    features.enableTextureMapping = has("texture");
    features.enableAccelStructure = has("accel");
    features.extra.enableBvhSahBinning = has("sah");
    features.extra.enableTransparency = has("transparency");
    features.extra.enableGlossyReflection = has("glossy");
    features.extra.enableMultipleRaysPerPixel = has("msaa");
    features.extra.enableDepthOfField = has("dof");
    features.extra.enableBloomEffect = has("bloom");
    features.extra.enableBilinearTextureFiltering = has("bilinear");

    Scene scene;
    if (sceneName.size() > 4
        && sceneName.compare(sceneName.size() - 4, 4, ".obj") == 0) {
        // arbitrary OBJ via the reference's file path (scene.cpp:94-103) —
        // the scale benchmark's dragon stand-in. Optional 7th arg:
        // "pointlight:x,y,z" adds a white point light.
        scene = loadSceneFromFile(sceneName, {});
        for (int a = 6; a < argc; ++a)
            if (strncmp(argv[a], "pointlight:", 11) == 0) {
                glm::vec3 v(0.0f);
                sscanf(argv[a] + 11, "%f,%f,%f", &v.x, &v.y, &v.z);
                scene.lights.push_back(PointLight { v, glm::vec3(1.0f) });
            }
    } else {
        auto sceneType = deserialize(sceneName);
        if (!sceneType) {
            fprintf(stderr, "unknown scene %s\n", sceneName.c_str());
            return 1;
        }
        scene = loadScenePrebuilt(*sceneType, DATA_DIR);
    }
    BvhInterface bvh { &scene, features };

    Window window { glm::ivec2(W, H) };
    Screen screen { glm::ivec2(W, H), false };
    Trackball camera { &window, glm::radians(50.0f), 3.0f };
    camera.setCamera(glm::vec3(0.0f), glm::radians(glm::vec3(20.0f, 20.0f, 0.0f)), 3.0f);

    double best = 1e30;
    for (int r = 0; r < reps; ++r) {
        screen.clear(glm::vec3(0.0f));
        auto t0 = std::chrono::high_resolution_clock::now();
        renderRayTracing(scene, camera, bvh, screen, features);
        auto t1 = std::chrono::high_resolution_clock::now();
        double ms = std::chrono::duration<double, std::milli>(t1 - t0).count();
        fprintf(stderr, "rep %d: %.1f ms\n", r, ms);
        if (ms < best) best = ms;
    }
    printf("BEST_MS %.3f\n", best);
    return 0;
}
