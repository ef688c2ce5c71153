SELECT CAST(lang AS VARCHAR) AS lang, CAST(n_docs AS BIGINT) AS n_docs, CAST(total_chars AS BIGINT) AS total_chars, CAST(total_tokens AS BIGINT) AS total_tokens, CAST(chars_per_token AS DOUBLE) AS chars_per_token FROM (VALUES
  ('de', 71, 22200, 12695, 1.74872),
  ('en', 193, 56684, 31958, 1.773703),
  ('es', 80, 24806, 13953, 1.777826),
  ('fr', 82, 27063, 15258, 1.773692),
  ('zh', 74, 22403, 12750, 1.757098)
) AS golden(lang, n_docs, total_chars, total_tokens, chars_per_token)
