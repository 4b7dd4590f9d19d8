"""Model families: Drost-style PPF matchers."""
