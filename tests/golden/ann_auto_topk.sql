SELECT CAST(vec_id AS BIGINT) AS vec_id, CAST(score AS DOUBLE) AS score FROM (VALUES
  (0, 1.0),
  (365, 0.369994),
  (334, 0.362722),
  (387, 0.331139),
  (423, 0.296934),
  (73, 0.295434),
  (7, 0.292842),
  (320, 0.287861),
  (190, 0.281795),
  (464, 0.276628)
) AS golden(vec_id, score)
