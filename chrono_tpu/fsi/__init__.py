from chrono_tpu.fsi import sph, bce
