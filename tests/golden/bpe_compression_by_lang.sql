SELECT CAST(lang AS VARCHAR) AS lang, CAST(n_docs AS BIGINT) AS n_docs, CAST(total_chars AS BIGINT) AS total_chars, CAST(total_tokens AS BIGINT) AS total_tokens, CAST(chars_per_token AS DOUBLE) AS chars_per_token FROM (VALUES
  ('de', 70, 19525, 10978, 1.778557),
  ('en', 218, 64437, 37106, 1.736566),
  ('es', 73, 21756, 12534, 1.735759),
  ('fr', 64, 20623, 11788, 1.749491),
  ('zh', 75, 22833, 13093, 1.743909)
) AS golden(lang, n_docs, total_chars, total_tokens, chars_per_token)
