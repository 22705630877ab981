from rwkv_tpu.io.quant import (  # noqa: F401
    QUANT_FORMATS,
    GgmlDType,
    quantize_rows,
    dequantize_rows,
    tensor_nbytes,
)
from rwkv_tpu.io.ggmf import (  # noqa: F401
    GgmfHeader,
    GgmfTensor,
    read_ggmf,
    write_ggmf,
    read_ggmf_header,
    iter_ggmf_tensors,
)
