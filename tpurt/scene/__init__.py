from tpurt.scene.scene import Scene, Camera, Materials, build_scene

__all__ = ["Scene", "Camera", "Materials", "build_scene"]
