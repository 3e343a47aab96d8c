// No-op debug-draw implementations + CPU-only Screen for the headless
// oracle build of the reference renderer (the real draw.cpp/screen.cpp are
// immediate-mode OpenGL). Semantics of Screen::setPixel/indexAt/clear match
// /root/reference/src/screen.cpp:31-60 (y-flipped storage).
#include "draw.h"
#include "screen.h"
#include <algorithm>
#include <cstdio>

bool enableDebugDraw = false;

void drawExampleOfCustomVisualDebug() {}
void drawPlane(const glm::vec3&, const glm::vec3&, const glm::vec3&,
               const glm::vec3&, const glm::vec3&, float) {}
void drawRay(const Ray&, const glm::vec3&) {}
void drawAABB(const AxisAlignedBox&, DrawMode, const glm::vec3&, float) {}
void debugDrawTriangle(const Vertex&, const Vertex&, const Vertex&) {}
void drawTriangle(const Vertex&, const Vertex&, const Vertex&) {}
void drawMesh(const Mesh&) {}
void drawSphere(const Sphere&) {}
void debugDrawSphere(const Sphere&) {}
void drawSphere(const glm::vec3&, float, const glm::vec3&) {}
void setColor(const glm::vec3&) {}
void drawScene(const Scene&) {}

Screen::Screen(const glm::ivec2& resolution, bool presentable)
    : m_presentable(presentable)
    , m_resolution(resolution)
    , m_textureData(size_t(resolution.x * resolution.y), glm::vec3(0.0f))
    , m_texture(0)
{
}

void Screen::clear(const glm::vec3& color)
{
    std::fill(std::begin(m_textureData), std::end(m_textureData), color);
}

void Screen::setPixel(int x, int y, const glm::vec3& color)
{
    const int i = (m_resolution.y - 1 - y) * m_resolution.x + x;
    m_textureData[size_t(i)] = color;
}

std::vector<glm::vec3> Screen::getTextureData() { return m_textureData; }

int Screen::indexAt(int x, int y) const
{
    return (m_resolution.y - 1 - y) * m_resolution.x + x;
}

glm::ivec2 Screen::resolution() const { return m_resolution; }

const std::vector<glm::vec3>& Screen::pixels() const { return m_textureData; }
std::vector<glm::vec3>& Screen::pixels() { return m_textureData; }

void Screen::draw() {}

void Screen::writeBitmapToFile(const std::filesystem::path& filePath)
{
    // raw float dump (the oracle compares in float space, not u8)
    FILE* f = fopen(filePath.string().c_str(), "wb");
    int wh[2] = { m_resolution.x, m_resolution.y };
    fwrite(wh, 4, 2, f);
    fwrite(m_textureData.data(), sizeof(glm::vec3), m_textureData.size(), f);
    fclose(f);
}
