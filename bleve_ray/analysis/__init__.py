from .analyzers import Analyzer, analyzer_named, register_analyzer, registered_analyzers
from .tokenizers import Token
