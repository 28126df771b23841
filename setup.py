"""Package build for mpibwa-tpu.

Pure-Python + JAX; native host extensions (C++) hook in here as they land
(build_ext is wired for future cpp/ sources).
"""

from setuptools import find_packages, setup

setup(
    name="mpibwa-tpu",
    version="0.1.0",
    description="TPU-native BWA-MEM-class read aligner (JAX/XLA/Pallas)",
    packages=find_packages(include=["mpibwa_tpu", "mpibwa_tpu.*"]),
    python_requires=">=3.10",
    install_requires=["numpy", "jax"],
    entry_points={
        "console_scripts": [
            "mpibwa-tpu=mpibwa_tpu.cli:main",
        ]
    },
)
