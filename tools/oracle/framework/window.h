// Headless stand-in for framework/window.h (shadows the GLFW-backed one via
// include-path ordering) so the reference renderer builds without a display.
// Only the surface used by trackball.cpp and the CLI path is provided.
#pragma once
#include <functional>
#include <glm/vec2.hpp>
#include <string_view>

#define GLFW_MOUSE_BUTTON_LEFT 0
#define GLFW_MOUSE_BUTTON_RIGHT 1
#define GLFW_PRESS 1

enum class OpenGLVersion { GL2, GL3, GL45 };

class Window {
public:
    Window(std::string_view, const glm::ivec2& size, OpenGLVersion, bool = true)
        : m_size(size) {}
    Window(const glm::ivec2& size) : m_size(size) {}

    [[nodiscard]] float getAspectRatio() const {
        return float(m_size.x) / float(m_size.y);
    }
    [[nodiscard]] glm::vec2 getCursorPos() const { return {0, 0}; }
    [[nodiscard]] bool isMouseButtonPressed(int) const { return false; }
    void registerMouseButtonCallback(std::function<void(int, int, int)>) {}
    void registerMouseMoveCallback(std::function<void(const glm::vec2&)>) {}
    void registerScrollCallback(std::function<void(const glm::vec2&)>) {}
    void registerWindowResizeCallback(std::function<void(const glm::ivec2&)>) {}

private:
    glm::ivec2 m_size;
};
