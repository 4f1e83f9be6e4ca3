from openmvg_tpu.core.types import UNDEFINED_INDEX, IndexDType
