"""Command-line entry points mirroring the reference's executables/:
laplace_main, poisson_main, cloud_detection_main."""
