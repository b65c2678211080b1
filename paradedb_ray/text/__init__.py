from paradedb_ray.text.tokenizers import (  # noqa: F401
    Token,
    Tokenizer,
    UnicodeWordsTokenizer,
    SimpleTokenizer,
    WhitespaceTokenizer,
    KeywordTokenizer,
    NgramTokenizer,
    RegexTokenizer,
    ChineseCompatibleTokenizer,
    SourceCodeTokenizer,
    tokenizer_from_config,
    default_tokenizer,
)
