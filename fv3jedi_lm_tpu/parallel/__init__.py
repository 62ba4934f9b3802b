from .halo import (  # noqa: F401
    fill_halo_center,
    fill_halo_corner,
    fill_halo_dgrid,
    fill_halo_cgrid,
    fix_shared_edges_dgrid,
    copy_corners,
    fill_corners_scalar,
    fill_corners_vector,
)
