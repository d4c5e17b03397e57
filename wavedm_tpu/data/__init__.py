from wavedm_tpu.data.raindrop import RainDrop, RainDropDataset
from wavedm_tpu.data.folder import PairedImageFolder
from wavedm_tpu.data.synthetic import SyntheticPairs
