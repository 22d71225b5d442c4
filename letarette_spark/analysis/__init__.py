from letarette_spark.analysis.tokenizer import Analyzer, AnalyzerConfig, Token

__all__ = ["Analyzer", "AnalyzerConfig", "Token"]
