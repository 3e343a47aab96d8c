// Headless golden-image generator driving the REAL reference renderer
// (src/render.cpp, light.cpp, shading.cpp, bounding_volume_hierarchy.cpp,
// scene.cpp + the prebuilt intersection library) with stubbed-out GL/window
// layers. Mirrors the CLI flow at /root/reference/src/main.cpp:478-535.
//
// Usage:
//   oracle <scene_name> <W> <H> <features_csv|'none'> <fov_deg> <dist>
//          <lx,ly,lz> <rx,ry,rz_deg> <out.raw>
//
// The output is a raw float32 dump: i32 W, i32 H, then W*H vec3 rows in the
// reference's y-flipped buffer order (row 0 = top).

#include "config.h"
#include "scene.h"
#include "bvh_interface.h"
#include "render.h"
#include "screen.h"
#include <framework/trackball.h>
#include <framework/window.h>
#include <cstdio>
#include <cstring>
#include <string>

static glm::vec3 parseVec3(const char* s)
{
    glm::vec3 v(0.0f);
    sscanf(s, "%f,%f,%f", &v.x, &v.y, &v.z);
    return v;
}

int main(int argc, char** argv)
{
    if (argc < 10) {
        fprintf(stderr, "usage: oracle scene W H features fov dist look rot out\n");
        return 1;
    }
    const std::string sceneName = argv[1];
    const int W = atoi(argv[2]);
    const int H = atoi(argv[3]);
    const std::string feats = argv[4];
    const float fovDeg = float(atof(argv[5]));
    const float dist = float(atof(argv[6]));
    const glm::vec3 lookAt = parseVec3(argv[7]);
    const glm::vec3 rotDeg = parseVec3(argv[8]);
    const char* outPath = argv[9];

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
    features.extra.enableBloomEffect = has("bloom");
    features.extra.enableBilinearTextureFiltering = has("bilinear");
    features.extra.enableMultipleRaysPerPixel = has("msaa");
    features.extra.enableGlossyReflection = has("glossy");
    features.extra.enableTransparency = has("transparency");
    features.extra.enableDepthOfField = has("dof");

    Scene scene;
    if (sceneName.size() > 4
        && sceneName.compare(sceneName.size() - 4, 4, ".obj") == 0) {
        // arbitrary OBJ through the reference's file path
        // (/root/reference/src/scene.cpp:94-103) — used for the scale-scene
        // golden (the shipped data/ has no large asset; dragon.obj is
        // referenced by scene.cpp:70-73 but absent). Lights come from the
        // pointlight: args below, like the config-file flow.
        scene = loadSceneFromFile(sceneName, {});
    } else {
        auto sceneType = deserialize(sceneName);
        if (!sceneType) {
            fprintf(stderr, "unknown scene %s\n", sceneName.c_str());
            return 1;
        }
        scene = loadScenePrebuilt(*sceneType, DATA_DIR);
    }
    // optional extra white point light: "pointlight:x,y,z" as a 10th arg
    // (lets deterministic feature combos be golden-tested on scenes whose
    // only shipped light is an area light, e.g. cube's segment light which
    // contributes nothing unless soft shadows are on — light.cpp:123-157)
    for (int a = 10; a < argc; ++a) {
        if (strncmp(argv[a], "pointlight:", 11) == 0)
            scene.lights.push_back(
                PointLight { parseVec3(argv[a] + 11), glm::vec3(1.0f) });
    }
    BvhInterface bvh { &scene, features };

    Window window { glm::ivec2(W, H) };
    Screen screen { glm::ivec2(W, H), false };
    screen.clear(glm::vec3(0.0f));
    Trackball camera { &window, glm::radians(fovDeg), dist };
    camera.setCamera(lookAt, glm::radians(rotDeg), dist);

    renderRayTracing(scene, camera, bvh, screen, features);
    screen.writeBitmapToFile(outPath);
    printf("wrote %s\n", outPath);
    return 0;
}
