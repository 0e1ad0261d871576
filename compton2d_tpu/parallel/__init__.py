"""Device-mesh parallelism: photon sharding, psum tallies, sharding specs."""
