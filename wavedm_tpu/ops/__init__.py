from wavedm_tpu.ops.wavelet import (
    haar_packet_basis,
    wavelet_dec,
    wavelet_rec,
    WaveletTransform,
)
