"""groma-tpu: TPU-native grounded multimodal LLM framework.

See README.md for the framework map and PARITY.md for component coverage
against the FoundationVision/Groma reference.
"""

__version__ = '0.1.0'
