"""The graph query language front end: lexer, IR, parser.

Mirrors the reference's libgdp (hand-written lexer gdp-lexer.c +
recursive-descent parser gdp-parse.c) as a clean-room Python
implementation driven by the published grammar in doc/gr-protocol.txt.
"""
