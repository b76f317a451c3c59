from .matchers import (  # noqa: F401
    census,
    extract_aml,
    extract_pkrn,
    get_left_cost,
    get_right_cost,
    ncc_nister,
    sadsob,
    sobel,
    zsad,
)
