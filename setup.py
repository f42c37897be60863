from setuptools import find_packages, setup

setup(
    name="super_resolution_tpu",
    version="0.1.0",
    description="TPU-native (JAX/XLA/Pallas) super-resolution framework: "
                "HAT/ESC/SwinIR model families, on-device tiled inference, "
                "data-parallel training over device meshes",
    packages=find_packages(include=["super_resolution_tpu",
                                    "super_resolution_tpu.*"]),
    python_requires=">=3.10",
    install_requires=["jax", "flax", "optax", "orbax-checkpoint", "numpy",
                      "pyyaml"],
    extras_require={"io": ["opencv-python"], "torch-import": ["torch"]},
)
